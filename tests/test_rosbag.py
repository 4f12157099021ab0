"""Rosbag ingestion: bag v2.0 container + PointCloud2 wire codec.

The reference's input is a rosbag replay (``main.cpp:59-95``); these tests
round-trip scans through our dependency-free writer/reader and exercise
the non-default wire layouts (extra fields, bz2 chunks, row padding)."""

import bz2
import struct

import numpy as np
import pytest

from lego_loam_tpu.io.rosbag import (POINTCLOUD2_TYPE, decode_pointcloud2,
                                     encode_pointcloud2, load_bag,
                                     read_pointcloud2_messages, write_bag)


def _rand_scan(n, seed):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, 3)).astype(np.float32) * 10.0


def test_pointcloud2_codec_roundtrip():
    xyz = _rand_scan(1000, 0)
    inten = np.arange(1000, dtype=np.float32)
    msg = encode_pointcloud2(xyz, 123.456, intensity=inten, seq=7)
    pts, stamp, meta = decode_pointcloud2(msg)
    assert abs(stamp - 123.456) < 1e-6
    assert meta["width"] == 1000 and meta["is_dense"]
    np.testing.assert_array_equal(pts["x"], xyz[:, 0])
    np.testing.assert_array_equal(pts["z"], xyz[:, 2])
    np.testing.assert_array_equal(pts["intensity"], inten)


def test_pointcloud2_velodyne_layout():
    """VLP-16 driver layout: x,y,z,intensity f4 + ring u2 + time f4, with
    point_step padding (22 bytes packed into a 32-byte stride)."""
    n = 64
    dt = np.dtype({"names": ["x", "y", "z", "intensity", "ring", "time"],
                   "formats": ["<f4"] * 4 + ["<u2", "<f4"],
                   "offsets": [0, 4, 8, 16, 20, 24], "itemsize": 32})
    rec = np.zeros(n, dt)
    rec["x"] = np.arange(n); rec["ring"] = np.arange(n) % 16
    fields = [("x", 0, 7, 1), ("y", 4, 7, 1), ("z", 8, 7, 1),
              ("intensity", 16, 7, 1), ("ring", 20, 4, 1),
              ("time", 24, 7, 1)]
    body = [struct.pack("<III", 0, 10, 500000000),
            struct.pack("<I", 8), b"velodyne",
            struct.pack("<II", 1, n), struct.pack("<I", len(fields))]
    for name, off, code, cnt in fields:
        nb = name.encode()
        body += [struct.pack("<I", len(nb)), nb,
                 struct.pack("<IBI", off, code, cnt)]
    data = rec.tobytes()
    body += [b"\x00", struct.pack("<II", 32, 32 * n),
             struct.pack("<I", len(data)), data, b"\x01"]
    pts, stamp, _ = decode_pointcloud2(b"".join(body))
    assert stamp == pytest.approx(10.5)
    np.testing.assert_array_equal(pts["x"], np.arange(n, dtype=np.float32))
    np.testing.assert_array_equal(pts["ring"], np.arange(n) % 16)


def test_bag_roundtrip(tmp_path):
    scans = [_rand_scan(500 + 10 * i, i) for i in range(5)]
    times = [1700000000.0 + 0.1 * i for i in range(5)]
    p = str(tmp_path / "seq.bag")
    write_bag(p, scans, times)
    s2, gt, t2 = load_bag(p)
    assert gt is None and len(s2) == 5
    for a, b in zip(scans, s2):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(t2, np.arange(5) * 0.1, atol=1e-6)


def test_bag_topic_filter(tmp_path):
    p = str(tmp_path / "seq.bag")
    write_bag(p, [_rand_scan(100, 0)], [0.0], topic="/velodyne_points")
    assert len(load_bag(p, topic="/velodyne_points")[0]) == 1
    with pytest.raises(ValueError, match="no sensor_msgs/PointCloud2"):
        load_bag(p, topic="/other")


def test_bag_bz2_chunk(tmp_path):
    """bz2-compressed chunks (``rosbag record --bz2``) decode too."""
    p = str(tmp_path / "plain.bag")
    scans = [_rand_scan(200, 3)]
    write_bag(p, scans, [5.0])
    raw = open(p, "rb").read()
    # recompress the chunk record in place: find the chunk by its header
    from lego_loam_tpu.io.rosbag import (MAGIC, OP_CHUNK, _encode_fields,
                                         _iter_records, _parse_fields)
    out = [MAGIC]
    for header, data in _iter_records(raw[len(MAGIC):]):
        if header.get(b"op", b"\x00")[0] == OP_CHUNK:
            header = dict(header)
            header[b"compression"] = b"bz2"
            data = bz2.compress(data)
        h = _encode_fields(header)
        out += [struct.pack("<I", len(h)), h,
                struct.pack("<I", len(data)), data]
    p2 = str(tmp_path / "bz2.bag")
    open(p2, "wb").write(b"".join(out))
    s2, _, _ = load_bag(p2)
    np.testing.assert_array_equal(s2[0], scans[0])


def test_bag_skips_non_cloud_connections(tmp_path):
    p = str(tmp_path / "seq.bag")
    write_bag(p, [_rand_scan(50, 1)], [0.0])
    msgs = list(read_pointcloud2_messages(p))
    assert msgs[0][0] == "/velodyne_points"
    assert msgs[0][3]["frame_id"] == "velodyne"


def test_bag_feeds_pipeline(tmp_path, small_sequence):
    """End-to-end: bag in → run.py driver → trajectory artifacts out."""
    scans, _gt, times = small_sequence
    p = str(tmp_path / "seq.bag")
    write_bag(p, scans[:4], [float(t) for t in times[:4]])
    out = str(tmp_path / "art")
    from lego_loam_tpu.run import main
    main(["--input", p, "--output", out, "--odometry-only"])
    import os
    assert os.path.exists(os.path.join(out, "trajectory_fused.tum"))


def test_lz4_block_and_frame_decode():
    """Hand-built LZ4 frame: one compressed block (literals + overlapping
    match) and one stored block."""
    import struct

    from lego_loam_tpu.io.rosbag import (_lz4_block_decompress,
                                         _lz4_frame_decompress)

    # token 0x44: 4 literals "ABCD", match len 4+4=8 at offset 4
    block = bytes([0x44]) + b"ABCD" + struct.pack("<H", 4)
    out = bytearray()
    _lz4_block_decompress(block, out)
    assert bytes(out) == b"ABCDABCDABCD"

    # frame: magic, FLG (version 01 <<6), BD, header checksum byte,
    # then [compressed block][stored block][end mark]
    stored = b"hello world"
    frame = (struct.pack("<I", 0x184D2204) + bytes([0x40, 0x70, 0x00])
             + struct.pack("<I", len(block)) + block
             + struct.pack("<I", 0x80000000 | len(stored)) + stored
             + struct.pack("<I", 0))
    assert _lz4_frame_decompress(frame) == b"ABCDABCDABCD" + stored


def test_lz4_chunked_bag_roundtrip(tmp_path):
    """A bag whose chunk is LZ4-framed (stored blocks — what matters is
    the chunk path through _decompress) must read back identically."""
    import struct

    from lego_loam_tpu.io import rosbag as rb

    rng = np.random.default_rng(3)
    scans = [rng.normal(size=(50, 3)).astype(np.float32)
             for _ in range(3)]
    times = [10.0, 10.1, 10.2]
    plain = str(tmp_path / "plain.bag")
    rb.write_bag(plain, scans, times)

    # recompress the chunk record as lz4 (stored blocks)
    raw = open(plain, "rb").read()
    buf = raw[len(rb.MAGIC):]
    out = [rb.MAGIC]
    for header, data in rb._iter_records(buf):
        op = header.get(b"op", b"\x00")[0]
        if op == rb.OP_CHUNK:
            frame = (struct.pack("<I", 0x184D2204)
                     + bytes([0x40, 0x70, 0x00])
                     + struct.pack("<I", 0x80000000 | len(data)) + data
                     + struct.pack("<I", 0))
            header = dict(header)
            header[b"compression"] = b"lz4"
            data = frame
        h = rb._encode_fields(header)
        out.append(struct.pack("<I", len(h)) + h
                   + struct.pack("<I", len(data)) + data)
    lz4_path = str(tmp_path / "lz4.bag")
    open(lz4_path, "wb").write(b"".join(out))

    got, _gt, t = rb.load_bag(lz4_path)
    assert len(got) == 3
    for a, b in zip(got, scans):
        np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_written_bag_is_indexed(tmp_path):
    """The writer emits IndexData + ChunkInfo + a nonzero index_pos."""
    import struct

    from lego_loam_tpu.io import rosbag as rb

    scans = [np.zeros((10, 3), np.float32)]
    path = str(tmp_path / "x.bag")
    rb.write_bag(path, scans, [1.5])
    buf = open(path, "rb").read()[len(rb.MAGIC):]
    ops = []
    index_pos = None
    for header, data in rb._iter_records(buf):
        op = header.get(b"op", b"\x00")[0]
        ops.append(op)
        if op == rb.OP_BAG_HEADER:
            (index_pos,) = struct.unpack("<Q", header[b"index_pos"])
        if op == rb.OP_INDEX:
            assert struct.unpack("<I", header[b"count"])[0] == 1
            s, ns, off = struct.unpack("<III", data)
            assert s == 1 and off > 0
    assert rb.OP_INDEX in ops and rb.OP_CHUNK_INFO in ops
    assert index_pos and index_pos > 0
