"""Demo CLIs end-to-end with tiny models and synthetic media."""

import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture
def env(tmp_path):
    import os
    e = dict(os.environ)
    e["JAX_PLATFORMS"] = "cpu"
    # This image's sitecustomize re-registers the tunnel TPU backend
    # whenever PALLAS_AXON_POOL_IPS is set, clobbering JAX_PLATFORMS —
    # the demo subprocess would then run on (or hang waiting for) the
    # tunnel chip instead of CPU.  Unset the trigger so the child is
    # genuinely CPU-only.
    e.pop("PALLAS_AXON_POOL_IPS", None)
    return e


def test_picture_demo_cli(tmp_path, env):
    cv2 = pytest.importorskip("cv2")
    img_path = tmp_path / "in.png"
    out_path = tmp_path / "out.png"
    img = (np.random.RandomState(0).rand(80, 100, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(img_path), img)
    r = subprocess.run(
        [sys.executable, "-m", "rtpose_tpu.demo.picture_demo",
         "--image", str(img_path), "--output", str(out_path),
         "--input-size", "56", "--stages", "1", "--fp32"],
        capture_output=True, text=True, timeout=900, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert out_path.exists()
    assert "found" in r.stdout


def test_video_demo_cli(tmp_path, env):
    cv2 = pytest.importorskip("cv2")
    vid_path = tmp_path / "in.avi"
    out_path = tmp_path / "out.avi"
    w = cv2.VideoWriter(str(vid_path), cv2.VideoWriter_fourcc(*"XVID"),
                        10, (100, 80))
    rng = np.random.RandomState(0)
    for _ in range(6):
        w.write((rng.rand(80, 100, 3) * 255).astype(np.uint8))
    w.release()
    r = subprocess.run(
        [sys.executable, "-m", "rtpose_tpu.demo.video_demo",
         "--video", str(vid_path), "--output", str(out_path),
         "--input-size", "56", "--stages", "1", "--fp32", "--batch", "3"],
        capture_output=True, text=True, timeout=900, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert out_path.exists()
    assert "processed 6 frames" in r.stdout
