"""ImageList datasets, multi-scale TTA, native thread-safety, utils."""

import json
import threading

import numpy as np
import PIL.Image
import pytest

import jax
import jax.numpy as jnp


def test_image_list(tmp_path):
    from rtpose_tpu.data.dataset import ImageList, PilImageList
    rng = np.random.RandomState(0)
    paths = []
    for i in range(2):
        p = tmp_path / f"im{i}.png"
        PIL.Image.fromarray(
            (rng.rand(20, 30, 3) * 255).astype(np.uint8)).save(p)
        paths.append(str(p))
    ds = ImageList(paths)
    path, original, arr = ds[0]
    assert path == paths[0]
    assert original.shape == (20, 30, 3)
    assert arr.shape == (20, 30, 3)

    pil_ds = PilImageList([PIL.Image.new("RGB", (10, 10))])
    idx, original, arr = pil_ds[0]
    assert idx == 0 and arr.shape == (10, 10, 3)


def test_multiscale_pipeline():
    from rtpose_tpu.infer.pipeline import PosePipeline
    from rtpose_tpu.models import get_model
    model = get_model("vgg19", num_stages=1, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 56, 56, 3)))
    pipe = PosePipeline(model, params, input_size=48, flip=False)
    img = (np.random.RandomState(0).rand(60, 70, 3) * 255).astype(np.uint8)
    people, heat, paf, meta = pipe.run_multiscale(img, scales=(0.75, 1.0))
    assert heat.shape[-1] == 19 and paf.shape[-1] == 38
    assert isinstance(people, list)


def test_native_grouping_thread_safe():
    native = pytest.importorskip("rtpose_tpu.native")
    if not native.available():
        pytest.skip("native toolchain unavailable")
    from rtpose_tpu.ops import grouping_ref as G
    from util_synth import synth_example

    cases = []
    for seed in range(4):
        _, heat, paf = synth_example(seed=seed, n_people=2 + seed)
        peaks = G.nms(heat, upsamp_factor=8, thresh=0.1)
        jl = G.joint_list_from_peaks(peaks)
        paf_up = G.upsample_nearest(paf, 8)
        shape = (heat.shape[0] * 8, heat.shape[1] * 8)
        expected, _ = native.group_peaks_native(jl, shape, paf_up)
        cases.append((jl, shape, paf_up, expected))

    errors = []

    def worker(case, reps=10):
        jl, shape, paf_up, expected = case
        for _ in range(reps):
            subset, _ = native.group_peaks_native(jl, shape, paf_up)
            if not np.allclose(subset, expected):
                errors.append("mismatch")

    threads = [threading.Thread(target=worker, args=(c,)) for c in cases
               for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors


def test_transforms_multiscale_class():
    from rtpose_tpu.data import transforms as T
    img = PIL.Image.new("RGB", (40, 40))
    kp = np.zeros((1, 17, 3))
    s = T.Sample.new(img, kp)
    ms = T.MultiScale([T.RescaleRelative(0.5), T.RescaleRelative(1.0)])
    outs = ms(s, np.random.default_rng(0))
    assert len(outs) == 2
    assert outs[0].image.size == (20, 20)
    assert outs[1].image.size == (40, 40)


def test_section_timer_and_meters():
    from rtpose_tpu.utils.meters import AverageMeter, MetricLogger
    from rtpose_tpu.utils.profiling import SectionTimer
    m = AverageMeter()
    m.update(2.0)
    m.update(4.0)
    assert m.avg == 3.0
    t = SectionTimer()
    with t.section("a"):
        pass
    assert "a" in t.summary()


def test_metric_logger_jsonl(tmp_path):
    from rtpose_tpu.utils.meters import MetricLogger
    log = MetricLogger(str(tmp_path))
    log.log(1, {"loss": 0.5})
    log.log(2, {"loss": 0.25}, prefix="train/")
    log.close()
    lines = (tmp_path / "metrics.jsonl").read_text().strip().split("\n")
    assert len(lines) == 2
    rec = json.loads(lines[1])
    assert rec["train/loss"] == 0.25


def test_cocopart_enum():
    from rtpose_tpu.skeleton import CocoPart
    assert CocoPart.nose == 0
    assert CocoPart.neck == 1
    assert CocoPart.left_ear == 17
    assert CocoPart.background == 18


def test_profiler_trace_smoke(tmp_path):
    from rtpose_tpu.utils.profiling import annotate, trace
    with trace(str(tmp_path)):
        with annotate("step"):
            _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    # a plugin/profile directory with trace artifacts appears
    import os
    found = []
    for root, _dirs, files in os.walk(tmp_path):
        found.extend(files)
    assert found, "no trace artifacts written"


def test_compile_cache_enable_first_call_wins(tmp_path, monkeypatch):
    """enable() is idempotent: the first call in a process pins the cache
    dir; later calls (e.g. PosePipeline's internal enable) are no-ops and
    cannot silently redirect it."""
    import jax

    from rtpose_tpu.utils import compile_cache

    monkeypatch.setattr(compile_cache, "_enabled", False)
    monkeypatch.delenv("RTPOSE_NO_COMPILE_CACHE", raising=False)
    monkeypatch.delenv("RTPOSE_COMPILE_CACHE_DIR", raising=False)
    prev = jax.config.jax_compilation_cache_dir
    try:
        first = str(tmp_path / "first")
        compile_cache.enable(first)
        assert jax.config.jax_compilation_cache_dir == first
        compile_cache.enable(str(tmp_path / "second"))
        assert jax.config.jax_compilation_cache_dir == first
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        compile_cache._enabled = False
