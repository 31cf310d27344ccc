"""EuRoC native-layout loader + CSV->TUM groundtruth converter."""

import numpy as np
import pytest

from rumi_slam_tpu.io import datasets


def _write_euroc(tmp_path, n=5):
    pytest.importorskip("PIL")
    from PIL import Image

    cam = tmp_path / "mav0" / "cam0"
    (cam / "data").mkdir(parents=True)
    rows = ["#timestamp [ns],filename"]
    rng = np.random.default_rng(0)
    for i in range(n):
        ns = 1403636579763555584 + i * 50_000_000
        name = f"{ns}.png"
        Image.fromarray(
            rng.integers(0, 255, (48, 64), dtype=np.uint8), mode="L"
        ).save(cam / "data" / name)
        rows.append(f"{ns},{name}")
    (cam / "data.csv").write_text("\n".join(rows) + "\n")

    gt = tmp_path / "mav0" / "state_groundtruth_estimate0"
    gt.mkdir(parents=True)
    lines = ["#timestamp, px, py, pz, qw, qx, qy, qz, ..."]
    for i in range(n):
        ns = 1403636579763555584 + i * 50_000_000
        lines.append(f"{ns},{0.1*i},{0.2*i},{0.0},1.0,0.0,0.0,0.0,0,0,0")
    (gt / "data.csv").write_text("\n".join(lines) + "\n")
    return tmp_path


def test_euroc_sequence(tmp_path):
    _write_euroc(tmp_path)
    seq = datasets.EurocSequence(tmp_path)
    assert len(seq) == 5
    img, t = seq.frame(0)
    assert img.shape == (48, 64) and img.dtype == np.float32
    assert abs(t - 1403636579.763555584) < 1e-3
    # 20 Hz cadence
    assert abs((seq.times[1] - seq.times[0]) - 0.05) < 1e-6

    times, xyz, quat = seq.groundtruth()
    assert len(times) == 5
    np.testing.assert_allclose(xyz[2], [0.2, 0.4, 0.0])
    np.testing.assert_allclose(quat[0], [1, 0, 0, 0])


def test_euroc_gt_converter(tmp_path):
    _write_euroc(tmp_path)
    out = tmp_path / "groundtruth.txt"
    n = datasets.euroc_gt_csv_to_txt(
        tmp_path / "mav0" / "state_groundtruth_estimate0" / "data.csv", out
    )
    assert n == 5
    times, xyz, quat = datasets.load_groundtruth(out)
    assert len(times) == 5
    np.testing.assert_allclose(xyz[1], [0.1, 0.2, 0.0])
