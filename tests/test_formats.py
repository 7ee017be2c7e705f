"""Golden-file tests for the I/O layer (SURVEY.md §4 item 2).

Byte-level checks against the reference formats: .dmb headers
(APD.cpp:3-49), camera text files (APD.cpp:51-92), pair.txt (main.cpp:6-49),
and binary PLY (APD.cpp:214-254).
"""

import struct

import numpy as np

from apdmvs_tpu.io import formats


def test_dmb_roundtrip_float(tmp_path):
    mat = np.random.RandomState(0).rand(13, 17).astype(np.float32)
    p = tmp_path / "d.dmb"
    formats.write_bin_mat(p, mat)
    with open(p, "rb") as f:
        version, rows, cols, cv_type = struct.unpack("<iiii", f.read(16))
    assert (version, rows, cols, cv_type) == (1, 13, 17, 5)  # CV_32FC1
    out = formats.read_bin_mat(p)
    np.testing.assert_array_equal(out, mat)


def test_dmb_roundtrip_vec3f(tmp_path):
    mat = np.random.RandomState(1).rand(7, 9, 3).astype(np.float32)
    p = tmp_path / "n.dmb"
    formats.write_bin_mat(p, mat)
    with open(p, "rb") as f:
        _, _, _, cv_type = struct.unpack("<iiii", f.read(16))
    assert cv_type == 21  # CV_32FC3
    np.testing.assert_array_equal(formats.read_bin_mat(p), mat)


def test_dmb_roundtrip_u8_and_i32(tmp_path):
    weak = np.random.RandomState(2).randint(0, 3, (5, 6)).astype(np.uint8)
    views = np.random.RandomState(3).randint(0, 2 ** 20, (5, 6)).astype(np.int32)
    p1, p2 = tmp_path / "weak.bin", tmp_path / "sv.bin"
    formats.write_bin_mat(p1, weak)
    formats.write_bin_mat(p2, views)
    with open(p1, "rb") as f:
        assert struct.unpack("<iiii", f.read(16))[3] == 0  # CV_8UC1
    with open(p2, "rb") as f:
        assert struct.unpack("<iiii", f.read(16))[3] == 4  # CV_32SC1
    np.testing.assert_array_equal(formats.read_bin_mat(p1), weak)
    np.testing.assert_array_equal(formats.read_bin_mat(p2), views)


def test_camera_roundtrip(tmp_path):
    rng = np.random.RandomState(4)
    R = np.linalg.qr(rng.randn(3, 3))[0]
    t = rng.randn(3)
    K = np.array([[321.5, 0, 160.0], [0, 322.5, 120.0], [0, 0, 1.0]])
    p = tmp_path / "00000000_cam.txt"
    formats.write_camera(p, K, R, t, 2.5, 0.01, 192, 7.5)
    cam = formats.read_camera(p)
    np.testing.assert_allclose(cam["K"], K, rtol=1e-5)
    np.testing.assert_allclose(cam["R"], R, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(cam["t"], t, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(cam["c"], -R.T @ t, rtol=1e-4, atol=1e-5)
    assert cam["depth_min"] == 2.5 and cam["depth_max"] == 7.5


def test_pair_roundtrip(tmp_path):
    pairs = [(0, [(1, 120.5), (2, 20.0), (3, -1.0)]), (1, [(0, 120.5)])]
    p = tmp_path / "pair.txt"
    formats.write_pair_file(p, pairs)
    out = formats.read_pair_file(p)
    assert out == [(0, [(1, 120.5), (2, 20.0), (3, -1.0)]), (1, [(0, 120.5)])]


def test_ply_roundtrip(tmp_path):
    coords = np.random.RandomState(5).randn(100, 3).astype(np.float32)
    colors = np.random.RandomState(6).randint(0, 256, (100, 3)).astype(np.uint8)
    p = tmp_path / "cloud.ply"
    formats.export_point_cloud(p, coords, colors)
    with open(p, "rb") as f:
        header = f.read(40)
    assert header.startswith(b"ply\nformat binary_little_endian 1.0\n")
    xyz, bgr = formats.read_point_cloud(p)
    np.testing.assert_array_equal(xyz, coords)
    np.testing.assert_array_equal(bgr, colors)


def test_synthetic_dataset_writes_contract(tmp_path):
    from apdmvs_tpu.datasets import synthetic

    cams, planes = synthetic.make_ring_scene(num_views=3, width=64, height=48)
    synthetic.write_mvsnet_dataset(tmp_path, cams, planes)
    assert (tmp_path / "pair.txt").exists()
    assert (tmp_path / "images" / "00000000.jpg").exists()
    assert (tmp_path / "cams" / "00000002_cam.txt").exists()
    pairs = formats.read_pair_file(tmp_path / "pair.txt")
    assert len(pairs) == 3 and len(pairs[0][1]) == 2
