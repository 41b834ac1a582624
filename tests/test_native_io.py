"""Native IO extension tests: PCD decode parity with the Python
implementation, FrameQueue streaming + drop-oldest backpressure.
Skipped (except fallback coverage) when the extension isn't built."""
import os

import numpy as np
import pytest

from loam_livox_tpu.io import native
from loam_livox_tpu.io.serialization import save_pcd


@pytest.fixture
def pcd_dir(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(6):
        xyz = rng.normal(size=(50 + i, 3)).astype(np.float32)
        inten = rng.uniform(size=50 + i).astype(np.float32)
        save_pcd(str(tmp_path / f"{i:04d}.pcd"), xyz, inten,
                 binary=(i % 2 == 0))
    return str(tmp_path)


class TestDecode:
    def test_native_available(self):
        assert native.have_native(), (
            "native extension not built — run python native/setup.py")

    @pytest.mark.parametrize("binary", [True, False])
    def test_decode_matches_python(self, tmp_path, binary):
        rng = np.random.default_rng(1)
        xyz = rng.normal(size=(123, 3)).astype(np.float32)
        inten = rng.uniform(size=123).astype(np.float32)
        p = str(tmp_path / "c.pcd")
        save_pcd(p, xyz, inten, binary=binary)
        nx, ni = native.decode_pcd_file(p)
        from loam_livox_tpu.io.serialization import load_pcd

        px, pi = load_pcd(p)
        np.testing.assert_allclose(nx, px, atol=1e-5)
        np.testing.assert_allclose(ni, pi, atol=1e-5)

    def test_decode_bytes(self, tmp_path):
        xyz = np.arange(30, dtype=np.float32).reshape(10, 3)
        p = str(tmp_path / "b.pcd")
        save_pcd(p, xyz, binary=True)
        nx, ni = native.decode_pcd(open(p, "rb").read())
        np.testing.assert_allclose(nx, xyz)
        assert ni is None

    def test_bad_header_raises(self):
        with pytest.raises(ValueError):
            native.decode_pcd(b"not a pcd\nDATA binary\n")


class TestFrameQueue:
    def test_streams_all_frames_in_order(self, pcd_dir):
        frames = list(native.pcd_dir_stream(pcd_dir))
        assert len(frames) == 6
        for i, (xyz, inten) in enumerate(frames):
            assert xyz.shape == (50 + i, 3)
            assert inten is not None

    def test_drop_oldest_backpressure(self, pcd_dir):
        import glob
        import time

        files = sorted(glob.glob(os.path.join(pcd_dir, "*.pcd")))
        q = native.make_frame_queue(files, capacity=2)
        time.sleep(0.5)  # let the producer outrun the consumer
        got = 0
        while q.next_frame() is not None:
            got += 1
        assert got + q.dropped() == 6
        assert q.dropped() >= 1
