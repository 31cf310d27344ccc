"""Tests for the native C++ edge runtime (frame queue, TUM reader, replay)."""

import time

import numpy as np
import pytest

from rumi_slam_tpu.runtime import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native runtime not built (no g++)"
)


def write_pgm(path, img):
    img = np.asarray(img, np.uint8)
    with open(path, "wb") as f:
        f.write(f"P5\n{img.shape[1]} {img.shape[0]}\n255\n".encode())
        f.write(img.tobytes())


@pytest.fixture()
def tum_dir(tmp_path):
    rng = np.random.default_rng(0)
    lines = ["# fake TUM dataset"]
    for i in range(12):
        img = rng.integers(0, 255, (24, 32), dtype=np.uint8)
        name = f"rgb/{i:04d}.pgm"
        (tmp_path / "rgb").mkdir(exist_ok=True)
        write_pgm(tmp_path / name, img)
        lines.append(f"{i * 0.033:.6f} {name}")
    (tmp_path / "rgb.txt").write_text("\n".join(lines))
    return tmp_path


class TestFrameQueue:
    def test_push_pop_fifo(self):
        q = native.FrameQueue(8, 4, 6)
        for i in range(5):
            q.push(float(i), np.full((4, 6), i, np.float32))
        assert len(q) == 5
        t, f = q.pop()
        assert t == 0.0 and float(f[0, 0]) == 0.0
        t, f = q.pop()
        assert t == 1.0
        q.close()

    def test_drop_oldest_when_full(self):
        q = native.FrameQueue(4, 2, 2)
        for i in range(10):
            q.push(float(i), np.full((2, 2), i, np.float32))
        assert q.dropped > 0
        t, _ = q.pop()
        assert t >= 6.0  # oldest were dropped
        q.close()

    def test_pop_empty(self):
        q = native.FrameQueue(2, 2, 2)
        assert q.pop() is None
        q.close()


class TestTumReader:
    def test_read_frames(self, tum_dir):
        ds = native.TumDataset(str(tum_dir))
        assert len(ds) == 12
        img = ds.read(0)
        assert img.shape == (24, 32)
        assert abs(ds.timestamp(3) - 0.099) < 1e-6
        ds.close()

    def test_paced_replay(self, tum_dir):
        ds = native.TumDataset(str(tum_dir))
        q = native.FrameQueue(32, 24, 32)
        ds.start_replay(q, pace=0.0)  # as fast as possible
        deadline = time.time() + 10.0
        got = []
        while len(got) < 12 and time.time() < deadline:
            item = q.pop()
            if item is not None:
                got.append(item[0])
            else:
                time.sleep(0.005)
        assert len(got) == 12
        assert got == sorted(got)
        ds.close()
        q.close()


def test_rss():
    assert native.rss_bytes() > 1024 * 1024
