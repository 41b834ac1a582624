"""Bag container + message codec tests (io.rosbag, io.lvx).

The reference ingests rosbags via ROS deserialization
(laser_feature_extractor.hpp:242-275); these tests validate the no-ROS
wire-format decoders byte-for-byte via writer→reader round trips.
"""
import numpy as np
import pytest

from loam_livox_tpu.io.rosbag import (
    BagReader,
    BagWriter,
    bag_frame_stream,
    decode_livox_custommsg,
    decode_pointcloud2,
    encode_livox_custommsg,
    encode_pointcloud2,
)


def _cloud(n, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * 5.0
    inten = rng.uniform(0, 200, size=n).astype(np.float32)
    return xyz, inten


def test_pointcloud2_roundtrip():
    xyz, inten = _cloud(257)
    raw = encode_pointcloud2(12.5, xyz, inten)
    pc = decode_pointcloud2(raw)
    assert pc.stamp == pytest.approx(12.5, abs=1e-9)
    np.testing.assert_array_equal(pc.xyz, xyz)
    np.testing.assert_array_equal(pc.intensity, inten)


def test_pointcloud2_no_intensity():
    xyz, _ = _cloud(10)
    pc = decode_pointcloud2(encode_pointcloud2(0.0, xyz))
    assert pc.intensity is None
    np.testing.assert_array_equal(pc.xyz, xyz)


def test_pointcloud2_strided_fields():
    """Decode a PCL-style padded layout (x y z _pad intensity, 32-byte
    point_step) — offsets must be honored, not assumed contiguous."""
    import struct

    xyz, inten = _cloud(50)
    n = len(xyz)
    blob = np.zeros((n, 8), np.float32)
    blob[:, 0:3] = xyz
    blob[:, 4] = inten
    out = bytearray()
    out += struct.pack("<I", 0)                   # seq
    out += struct.pack("<II", 3, 0)               # stamp
    out += struct.pack("<I", 0)                   # frame_id ""
    out += struct.pack("<II", 1, n)
    fields = [("x", 0), ("y", 4), ("z", 8), ("intensity", 16)]
    out += struct.pack("<I", len(fields))
    for name, off in fields:
        nm = name.encode()
        out += struct.pack("<I", len(nm)) + nm
        out += struct.pack("<IBI", off, 7, 1)
    out += b"\x00"
    out += struct.pack("<II", 32, 32 * n)
    data = blob.astype("<f4").tobytes()
    out += struct.pack("<I", len(data)) + data
    out += b"\x01"
    pc = decode_pointcloud2(bytes(out))
    np.testing.assert_array_equal(pc.xyz, xyz)
    np.testing.assert_array_equal(pc.intensity, inten)


def test_custommsg_roundtrip():
    xyz, refl = _cloud(300, seed=1)
    offs = (np.arange(300) * 10_000).astype(np.uint32)
    raw = encode_livox_custommsg(7.25, xyz, refl, offs, lidar_id=2)
    m = decode_livox_custommsg(raw)
    assert m.stamp == pytest.approx(7.25)
    assert m.lidar_id == 2
    np.testing.assert_array_equal(m.xyz, xyz)
    np.testing.assert_array_equal(m.offset_time_ns, offs)
    np.testing.assert_array_equal(
        m.reflectivity, np.clip(refl, 0, 255).astype(np.uint8))


@pytest.mark.parametrize("compression", ["none", "bz2"])
def test_bag_roundtrip(tmp_path, compression):
    path = str(tmp_path / "t.bag")
    frames = [_cloud(64, seed=s) for s in range(5)]
    with BagWriter(path, compression=compression) as w:
        for i, (xyz, inten) in enumerate(frames):
            w.write("/livox/lidar", "livox_ros_driver/CustomMsg",
                    100.0 + i * 0.1,
                    encode_livox_custommsg(100.0 + i * 0.1, xyz, inten))
    got = list(bag_frame_stream(path))
    assert len(got) == 5
    for (xyz, inten), (gx, gi, gt) in zip(frames, got):
        np.testing.assert_array_equal(gx, xyz)
    assert got[3][2] == pytest.approx(100.3)


def test_bag_topic_filter_and_mixed_types(tmp_path):
    path = str(tmp_path / "mix.bag")
    with BagWriter(path) as w:
        for i in range(3):
            xyz, inten = _cloud(32, seed=i)
            w.write("/velodyne", "sensor_msgs/PointCloud2", float(i),
                    encode_pointcloud2(float(i), xyz, inten))
            w.write("/livox/lidar", "livox_ros_driver/CustomMsg",
                    float(i), encode_livox_custommsg(float(i), xyz, inten))
        # a non-pointcloud topic must be ignored by the frame stream
        w.write("/tf", "tf2_msgs/TFMessage", 0.0, b"\x00" * 8)
    assert len(list(bag_frame_stream(path, topic="/velodyne"))) == 3
    assert len(list(bag_frame_stream(path, topic="/livox/lidar"))) == 3
    # auto-select sticks to the first point-cloud topic seen
    assert len(list(bag_frame_stream(path))) == 3
    r = BagReader(path)
    assert r.topics()["/livox/lidar"] == "livox_ros_driver/CustomMsg"


def test_bag_multiple_chunks(tmp_path):
    path = str(tmp_path / "chunks.bag")
    with BagWriter(path) as w:
        for i in range(4):
            xyz, inten = _cloud(16, seed=i)
            w.write("/livox/lidar", "livox_ros_driver/CustomMsg",
                    float(i), encode_livox_custommsg(float(i), xyz, inten))
            w.flush()   # one chunk per message
    assert len(list(bag_frame_stream(path))) == 4


def test_lvx_roundtrip(tmp_path):
    from loam_livox_tpu.io.lvx import LvxReader, LvxWriter

    path = str(tmp_path / "t.lvx")
    rng = np.random.default_rng(3)
    frames = []
    with LvxWriter(path) as w:
        for i in range(3):
            xyz = rng.uniform(1.0, 20.0, size=(960, 3))
            refl = rng.uniform(0, 200, size=960)
            frames.append(xyz)
            w.add_points(xyz, refl, timestamp_ns=int(i * 1e8))
    r = LvxReader(path)
    assert r.device_count == 1
    got = list(r.frames(frame_period_s=0.1))
    assert len(got) == 3
    for xyz, (gx, gr, gt) in zip(frames, got):
        # mm quantization on disk
        np.testing.assert_allclose(gx[: len(xyz)], xyz, atol=6e-4)


def test_truncated_bag_replays_to_damage_point(tmp_path):
    """The reader's contract: a damaged/truncated tail stops replay
    gracefully after the messages before the damage (no parser
    internals surface)."""
    import warnings

    from loam_livox_tpu.io.rosbag import (
        BagReader, BagWriter, encode_pointcloud2)

    p = tmp_path / "t.bag"
    with BagWriter(str(p)) as w:
        for i in range(5):
            pts = np.random.default_rng(i).uniform(-1, 1, (50, 3)
                                                   ).astype(np.float32)
            raw = encode_pointcloud2(float(i), pts,
                                     np.zeros(50, np.float32))
            w.write("/pc", "sensor_msgs/PointCloud2", float(i), raw)
    whole = p.read_bytes()
    n_msgs = len(list(BagReader(str(p)).messages()))
    assert n_msgs == 5

    cut = tmp_path / "cut.bag"
    cut.write_bytes(whole[: int(len(whole) * 0.55)])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        got = list(BagReader(str(cut)).messages())
    assert 0 < len(got) < 5       # some messages, graceful stop


def test_garbage_after_magic_stops_gracefully(tmp_path):
    import warnings

    from loam_livox_tpu.io.rosbag import MAGIC, BagReader

    p = tmp_path / "g.bag"
    p.write_bytes(MAGIC + b"\xff" * 64)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        assert list(BagReader(str(p)).messages()) == []


def test_bad_magic_raises(tmp_path):
    from loam_livox_tpu.io.rosbag import BagReader

    p = tmp_path / "x.bag"
    p.write_bytes(b"NOT A BAG")
    with pytest.raises(ValueError):
        BagReader(str(p))


def test_lvx_truncated_yields_prefix(tmp_path):
    """A truncated .lvx yields the packages before the damage point
    without raising (bounds-checked package walk)."""
    from loam_livox_tpu.io.lvx import LvxReader, LvxWriter

    path = tmp_path / "t.lvx"
    rng = np.random.default_rng(4)
    with LvxWriter(str(path)) as w:
        for i in range(4):
            w.add_points(rng.uniform(1.0, 20.0, size=(960, 3)),
                         rng.uniform(0, 200, size=960),
                         timestamp_ns=int(i * 1e8))
    whole = path.read_bytes()
    full = len(list(LvxReader(str(path)).frames(frame_period_s=0.1)))
    assert full == 4

    cut = tmp_path / "cut.lvx"
    cut.write_bytes(whole[: int(len(whole) * 0.6)])
    got = list(LvxReader(str(cut)).frames(frame_period_s=0.1))
    assert 0 < len(got) < 4
