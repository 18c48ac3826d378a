"""Native bag reader round-trip tests: a minimal pure-Python rosbag v2.0
writer (following http://wiki.ros.org/Bags/Format/2.0) produces files that
the C++ reader must decode exactly.
"""

import struct

import numpy as np
import pytest

from vil_sensor_fusion_tpu.data import rosbag_io


# --- minimal bag writer ------------------------------------------------------

def _field(name: str, value: bytes) -> bytes:
    body = name.encode() + b"=" + value
    return struct.pack("<I", len(body)) + body


def _record(fields: dict, data: bytes) -> bytes:
    hdr = b"".join(_field(k, v) for k, v in fields.items())
    return (struct.pack("<I", len(hdr)) + hdr
            + struct.pack("<I", len(data)) + data)


def _rosstr(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def _header_msg(stamp: float, frame: str = "f") -> bytes:
    sec = int(stamp)
    nsec = int(round((stamp - sec) * 1e9))
    return struct.pack("<III", 7, sec, nsec) + _rosstr(frame)


def _imu_msg(stamp, gyro, accel) -> bytes:
    out = _header_msg(stamp)
    out += struct.pack("<4d", 0, 0, 0, 1)          # orientation
    out += struct.pack("<9d", *([0.0] * 9))
    out += struct.pack("<3d", *gyro)
    out += struct.pack("<9d", *([0.0] * 9))
    out += struct.pack("<3d", *accel)
    out += struct.pack("<9d", *([0.0] * 9))
    return out


def _odom_msg(stamp, pos, quat_xyzw, pose_cov, twist_cov) -> bytes:
    out = _header_msg(stamp)
    out += _rosstr("base")
    out += struct.pack("<3d", *pos)
    out += struct.pack("<4d", *quat_xyzw)
    out += struct.pack("<36d", *pose_cov)
    out += struct.pack("<6d", *([0.0] * 6))
    out += struct.pack("<36d", *twist_cov)
    return out


def _cloud_msg(stamp, xyz: np.ndarray) -> bytes:
    out = _header_msg(stamp)
    n = len(xyz)
    out += struct.pack("<II", 1, n)                # height, width
    out += struct.pack("<I", 3)                    # 3 fields
    for i, name in enumerate(["x", "y", "z"]):
        out += _rosstr(name)
        out += struct.pack("<IBI", 4 * i, 7, 1)    # offset, FLOAT32, count
    out += struct.pack("<B", 0)                    # is_bigendian
    out += struct.pack("<II", 12, 12 * n)          # point_step, row_step
    data = xyz.astype(np.float32).tobytes()
    out += struct.pack("<I", len(data)) + data
    out += struct.pack("<B", 1)                    # is_dense
    return out


def _image_msg(stamp, img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    out = _header_msg(stamp)
    out += struct.pack("<II", h, w)
    out += _rosstr("mono8" if ch == 1 else "rgb8")
    out += struct.pack("<B", 0)
    out += struct.pack("<I", w * ch)
    data = img.tobytes()
    out += struct.pack("<I", len(data)) + data
    return out


def _conn_record(conn_id: int, topic: str, datatype: str) -> bytes:
    inner = (_field("topic", topic.encode())
             + _field("type", datatype.encode())
             + _field("md5sum", b"0" * 32)
             + _field("message_definition", b""))
    return _record(
        {"op": b"\x07", "conn": struct.pack("<i", conn_id),
         "topic": topic.encode()},
        inner)


def _msg_record(conn_id: int, stamp: float, payload: bytes) -> bytes:
    t_ns = int(stamp * 1e9)
    time_field = struct.pack("<II", t_ns // 10**9, t_ns % 10**9)
    return _record(
        {"op": b"\x02", "conn": struct.pack("<i", conn_id),
         "time": time_field},
        payload)


def _write_bag(path, records: bytes, chunked: bool):
    bag_header = _record(
        {"op": b"\x03",
         "index_pos": struct.pack("<Q", 0),
         "conn_count": struct.pack("<I", 2),
         "chunk_count": struct.pack("<I", 1)},
        b" " * 4096)  # the reference implementation pads this record
    if chunked:
        chunk = _record(
            {"op": b"\x05", "compression": b"none",
             "size": struct.pack("<I", len(records))},
            records)
        body = bag_header + chunk
    else:
        body = bag_header + records
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(body)


@pytest.fixture(params=[False, True], ids=["flat", "chunked"])
def sample_bag(request, tmp_path):
    rng = np.random.default_rng(0)
    recs = b""
    recs += _conn_record(0, "/imu/fusion", "sensor_msgs/Imu")
    recs += _conn_record(1, "/rovio/odometry", "nav_msgs/Odometry")
    recs += _conn_record(2, "/lidar", "sensor_msgs/PointCloud2")
    recs += _conn_record(3, "/cam/image", "sensor_msgs/Image")
    imu = [(0.1 * i, rng.standard_normal(3), rng.standard_normal(3))
           for i in range(5)]
    for t, g, a in imu:
        recs += _msg_record(0, t, _imu_msg(t, g, a))
    odo = [(0.2, [1.0, 2.0, 3.0], [0.0, 0.0, 0.0, 1.0],
            np.arange(36.0), np.arange(36.0) * 2)]
    for t, p, q, pc, tc in odo:
        recs += _msg_record(1, t, _odom_msg(t, p, q, pc, tc))
    cloud = rng.standard_normal((100, 3)).astype(np.float32)
    recs += _msg_record(2, 0.3, _cloud_msg(0.3, cloud))
    img = (rng.uniform(0, 255, (4, 6)).astype(np.uint8))
    recs += _msg_record(3, 0.4, _image_msg(0.4, img))

    path = tmp_path / "test.bag"
    _write_bag(path, recs, chunked=request.param)
    return path, imu, odo, cloud, img


class TestBagReader:
    def test_topics_and_counts(self, sample_bag):
        path, imu, odo, cloud, img = sample_bag
        with rosbag_io.BagReader(path) as bag:
            t = bag.topics()
            assert t["/imu/fusion"] == "sensor_msgs/Imu"
            assert t["/rovio/odometry"] == "nav_msgs/Odometry"
            assert bag.count("/imu/fusion") == 5
            assert bag.count("/lidar") == 1

    def test_imu_roundtrip(self, sample_bag):
        path, imu, *_ = sample_bag
        with rosbag_io.BagReader(path) as bag:
            t, a, g = bag.read_imu("/imu/fusion")
        assert len(t) == 5
        for i, (ti, gi, ai) in enumerate(imu):
            np.testing.assert_allclose(t[i], ti, atol=1e-9)
            np.testing.assert_allclose(g[i], gi, rtol=1e-12)
            np.testing.assert_allclose(a[i], ai, rtol=1e-12)

    def test_odometry_roundtrip(self, sample_bag):
        path, _, odo, *_ = sample_bag
        with rosbag_io.BagReader(path) as bag:
            t, p, pc, tc = bag.read_odometry("/rovio/odometry")
        assert len(t) == 1
        # pose7 is (qw qx qy qz tx ty tz); writer used xyzw = (0,0,0,1)
        np.testing.assert_allclose(p[0], [1, 0, 0, 0, 1, 2, 3], atol=1e-12)
        np.testing.assert_allclose(pc[0].reshape(-1), np.arange(36.0))
        np.testing.assert_allclose(tc[0].reshape(-1), np.arange(36.0) * 2)

    def test_pointcloud_roundtrip(self, sample_bag):
        path, *_, cloud, _ = sample_bag
        with rosbag_io.BagReader(path) as bag:
            t, xyz = bag.read_pointcloud("/lidar", 0)
        assert t == pytest.approx(0.3, abs=1e-9)
        np.testing.assert_allclose(xyz, cloud, rtol=1e-7)

    def test_image_roundtrip(self, sample_bag):
        path, *_, img = sample_bag
        with rosbag_io.BagReader(path) as bag:
            t, out, enc = bag.read_image("/cam/image", 0)
        assert enc == "mono8"
        np.testing.assert_array_equal(out, img)

    def test_stamps(self, sample_bag):
        path, imu, *_ = sample_bag
        with rosbag_io.BagReader(path) as bag:
            st = bag.stamps("/imu/fusion")
        np.testing.assert_allclose(st, [t for t, _, _ in imu], atol=1e-9)

    def test_bad_file_raises(self, tmp_path):
        p = tmp_path / "not.bag"
        p.write_bytes(b"garbage")
        with pytest.raises(IOError):
            rosbag_io.BagReader(p)


# --- product writer (rosbag_writer) round-trips, incl. compressed chunks -----

from vil_sensor_fusion_tpu.data import rosbag_writer as W


class TestBagWriterRoundtrip:
    @pytest.mark.parametrize("compression", ["none", "bz2"])
    def test_full_roundtrip(self, tmp_path, compression):
        rng = np.random.default_rng(1)
        cloud = rng.standard_normal((300, 3)).astype(np.float32)
        img = rng.integers(0, 255, (6, 9), dtype=np.uint8)
        path = tmp_path / f"rt_{compression}.bag"
        with W.BagWriter(path, compression=compression,
                         chunk_threshold=1024) as w:
            for i in range(12):
                w.write_msg("/imu", "sensor_msgs/Imu", 0.01 * i,
                            [1.0, 2.0, 3.0], [4.0, 5.0, 6.0])
            w.write_msg("/lidar", "sensor_msgs/PointCloud2", 0.5, cloud)
            w.write_msg("/cam", "sensor_msgs/Image", 0.6, img)
            w.write_msg("/odom", "nav_msgs/Odometry", 0.7,
                        [1, 0, 0, 0, 1.5, 2.5, 3.5])
        with rosbag_io.BagReader(path) as bag:
            assert bag.count("/imu") == 12
            t, a, g = bag.read_imu("/imu")
            np.testing.assert_allclose(a[0], [4, 5, 6])
            np.testing.assert_allclose(g[0], [1, 2, 3])
            _, xyz = bag.read_pointcloud("/lidar", 0)
            np.testing.assert_allclose(xyz, cloud)
            _, im, enc = bag.read_image("/cam", 0)
            assert enc == "mono8"
            np.testing.assert_array_equal(im, img)
            _, p, _, _ = bag.read_odometry("/odom")
            np.testing.assert_allclose(p[0], [1, 0, 0, 0, 1.5, 2.5, 3.5])

    def test_lz4_chunk(self, tmp_path):
        """roslz4 emits standard LZ4 frames; synthesize one via liblz4 and
        check the reader decodes it (the `rosbag record --lz4` path)."""
        import ctypes

        try:
            lz4 = ctypes.CDLL("liblz4.so.1")
        except OSError:
            pytest.skip("liblz4 unavailable")
        lz4.LZ4F_compressFrameBound.restype = ctypes.c_size_t
        lz4.LZ4F_compressFrameBound.argtypes = [ctypes.c_size_t,
                                                ctypes.c_void_p]
        lz4.LZ4F_compressFrame.restype = ctypes.c_size_t
        lz4.LZ4F_compressFrame.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_size_t, ctypes.c_void_p]
        lz4.LZ4F_isError.restype = ctypes.c_uint
        lz4.LZ4F_isError.argtypes = [ctypes.c_size_t]

        w = W.BagWriter(tmp_path / "unused.bag")
        w.add_topic("/imu", "sensor_msgs/Imu")
        w.write("/imu", 0.25, W.imu_msg(0.25, [7, 8, 9], [1, 1, 1]))
        raw = w._pending
        bound = lz4.LZ4F_compressFrameBound(len(raw), None)
        dst = ctypes.create_string_buffer(bound)
        n = lz4.LZ4F_compressFrame(dst, bound, raw, len(raw), None)
        assert not lz4.LZ4F_isError(n)
        chunk = W._record(
            {"op": b"\x05", "compression": b"lz4",
             "size": struct.pack("<I", len(raw))}, dst.raw[:n])
        hdr = W._record(
            {"op": b"\x03", "index_pos": struct.pack("<Q", 0),
             "conn_count": struct.pack("<I", 1),
             "chunk_count": struct.pack("<I", 1)}, b" " * 4096)
        path = tmp_path / "lz4.bag"
        path.write_bytes(b"#ROSBAG V2.0\n" + hdr + chunk)
        with rosbag_io.BagReader(path) as bag:
            t, a, g = bag.read_imu("/imu")
            np.testing.assert_allclose(g[0], [7, 8, 9])
            np.testing.assert_allclose(t[0], 0.25, atol=1e-9)


class TestFixBagTime:
    def test_skewed_record_times_rewritten(self, tmp_path):
        """fix_bag_time must rewrite record time := header stamp for
        header-led messages (the reference's fix_rosbag_time.py:28-47:
        wall-clock record times vs sim-clock headers on externally
        recorded bags)."""
        import vil_sensor_fusion_tpu.data.rosbag_writer as W
        from vil_sensor_fusion_tpu.data.bagtools import fix_bag_time
        from vil_sensor_fusion_tpu.data.rosbag_io import BagReader

        src = tmp_path / "skewed.bag"
        # Header stamps 10.0..10.4 s; record times 100..104 s (a 90 s skew,
        # the signature of recording wall-clock while sim runs slow).
        with W.BagWriter(src) as w:
            w.add_topic("/imu", "sensor_msgs/Imu")
            for i in range(5):
                hdr = 10.0 + 0.1 * i
                w.write("/imu", 100.0 + i,
                        W.imu_msg(hdr, [0, 0, 0], [0, 0, 9.81]))
            w.add_topic("/odom", "nav_msgs/Odometry")
            w.write("/odom", 103.0,
                    W.odometry_msg(10.25, [1, 0, 0, 0, 1, 2, 3]))

        out = tmp_path / "fixed.bag"
        report = fix_bag_time(src, out)
        assert report["rewritten"] == 6
        assert report["kept"] == 0
        np.testing.assert_allclose(report["max_skew_s"], 104.0 - 10.4,
                                   atol=1e-6)

        with BagReader(out) as bag:
            assert bag.count("/imu") == 5
            for i in range(5):
                rec_t, payload = bag.read_record("/imu", i)
                np.testing.assert_allclose(rec_t, 10.0 + 0.1 * i,
                                           atol=1e-9)
            rec_t, _ = bag.read_record("/odom", 0)
            np.testing.assert_allclose(rec_t, 10.25, atol=1e-9)
            # Payloads untouched: the decoded IMU stream is identical.
            t, a, g = bag.read_imu("/imu")
            np.testing.assert_allclose(t, 10.0 + 0.1 * np.arange(5),
                                       atol=1e-9)
            np.testing.assert_allclose(a[:, 2], 9.81)

    def test_headerless_records_keep_time(self, tmp_path):
        """Types without a leading header keep their record time, as the
        reference does (fix_rosbag_time.py:41-42)."""
        import vil_sensor_fusion_tpu.data.rosbag_writer as W
        from vil_sensor_fusion_tpu.data.bagtools import fix_bag_time
        from vil_sensor_fusion_tpu.data.rosbag_io import BagReader

        src = tmp_path / "noheader.bag"
        with W.BagWriter(src) as w:
            w.add_topic("/chatter", "std_msgs/String")
            w.write("/chatter", 55.5, b"\x02\x00\x00\x00hi")
        out = tmp_path / "fixed.bag"
        report = fix_bag_time(src, out)
        assert report["kept"] == 1 and report["rewritten"] == 0
        with BagReader(out) as bag:
            rec_t, payload = bag.read_record("/chatter", 0)
            np.testing.assert_allclose(rec_t, 55.5, atol=1e-9)
            assert payload == b"\x02\x00\x00\x00hi"
