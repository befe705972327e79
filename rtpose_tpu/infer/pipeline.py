"""The image->skeletons inference pipeline.

One jitted call covers: uint8->float normalization -> CNN forward
(optionally both orientations for flip TTA, fused as a batch of 2) ->
flip-swap averaging -> on-device NMS + grouping.  The host only
resizes/pads the uint8 input image and reads back fixed-shape people
arrays (shipping uint8 keeps host->device traffic 4x smaller than the
reference's float CHW tensors, evaluate/coco_eval.py:105-108).

Flip TTA follows reference evaluate/coco_eval.py:197-242 (swap tables
derived in rtpose_tpu.skeleton); the committed reference never wires it
into eval, but its README attributes mAP 0.653 vs 0.577 to exactly this
averaging, so here it is a first-class pipeline flag.  Multi-scale TTA
(the reference's unused MultiScale scaffolding, transforms.py:139-156,
coco_eval.py:107) is `run_multiscale`.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.common import ModelOutput
from ..ops.decode import decode_poses, decode_poses_batch, people_to_numpy
from ..ops.grouping import People
from ..skeleton import FLIP_HEAT, FLIP_PAF, NUM_LIMBS
from .preprocess import (crop_with_factor, normalize_device,
                         scale_pad_geometry)

_FLIP_PAF_ARR = np.array(FLIP_PAF)
_FLIP_HEAT_ARR = np.array(FLIP_HEAT)
# x-channels (even index into each limb's (x,y) pair) get negated on flip
_PAF_X_NEG = np.ones(2 * NUM_LIMBS, dtype=np.float32)
_PAF_X_NEG[0::2] = -1.0

# HBM guard for stacked multi-scale batches: cap B so that
# B * (largest scaled H*W) stays under this budget (expressed for bf16
# compute; the cap halves for f32 — see PosePipeline.ms_chunk_cap).
# Calibrated on v5e (15.75 GiB usable HBM): a 16-frame bf16 chunk at
# max-scale (576, 1920) = 17.7 Mpx-frames compiled to a 16.9 GiB program
# and OOMed — the two live conv1 temporaries dominate, each
# [2B, H, W, 64] tiled to 128 lanes (2x channel padding) — while the
# standard 368-input bucket (max scale 576x832 = 0.48 Mpx) ran the whole
# 5,000-image rehearsal at B=16 = 7.7 Mpx-frames. 8 Mpx (bf16) keeps the
# dominant temps under ~9 GiB and the standard bucket at full batch 16.
MS_PIXEL_BUDGET = 8_000_000

# Raised decode caps for the automatic truncation retry: the values the
# crowded-scene hardware soak validated against the unbounded host oracle
# (scripts/soak_decode.py; 21/100 crowded scenes overflow the defaults).
# The reference keeps unbounded dynamic lists (pafprocess.cpp:24-43), so a
# silently truncated frame would diverge from it exactly on the crowded
# images where AP is hardest.
RETRY_CAPS = dict(max_peaks=64, max_candidates=1024,
                  max_total_conns=608, max_people=128)


def average_flip(heat: jax.Array, heat_flipped: jax.Array,
                 paf: jax.Array, paf_flipped: jax.Array
                 ) -> Tuple[jax.Array, jax.Array]:
    """Average normal and mirrored predictions (HWC maps).

    Channel reordering by the derived swap tables and x-component negation
    (reference coco_eval.py:228-240).
    """
    hf = heat_flipped[:, ::-1, :][:, :, _FLIP_HEAT_ARR]
    pf = paf_flipped[:, ::-1, :]
    pf = pf[:, :, _FLIP_PAF_ARR] * _PAF_X_NEG
    return (heat + hf) / 2.0, (paf + pf) / 2.0


def make_infer_fn(model, *, preprocess_mode: str = "vgg",
                  thresh_heatmap: float = 0.1, max_peaks: int = 32,
                  max_people: int = 64, downsample: int = 8,
                  flip: bool = True, decode: bool = True,
                  max_candidates: int = 256, max_total_conns: int = 160,
                  sampling: str = "auto", gaussian_filt: bool = False,
                  device_resize_to: int = 0, pad_factor: int = 0):
    """Build the jitted uint8-image->People function.

    Returned fn: (params, image_hwc_uint8) -> (People | None, heat, paf).
    jit-compiled per input shape (use bucketing upstream to bound
    recompiles).

    device_resize_to > 0: the input is the RAW native-resolution uint8
    frame and crop_with_factor's scale+pad runs in-graph (cv2-INTER_LINEAR-
    parity bilinear, ops/resize.py) before normalization — the host ships
    the source bytes, not the enlarged frame (2.3x fewer H2D bytes for
    240x320 video upscaled to 368; serving is transfer-bound on the tunnel
    TPU).  All shapes stay static: scale targets derive from the traced
    input shape.
    """

    @jax.jit
    def infer(params, image_u8):
        if device_resize_to:
            # shapes here are trace-time constants; the same helper computes
            # the host-side meta (PosePipeline._prep) so they cannot drift
            h, w = image_u8.shape[0], image_u8.shape[1]
            _, rh, rw, ph, pw = scale_pad_geometry(
                h, w, device_resize_to, pad_factor or downsample)
            from ..ops.resize import resize_bilinear
            x = resize_bilinear(image_u8.astype(jnp.float32), (rh, rw))
            # zero-pad in RAW pixel space (black), like the reference's
            # crop_with_factor (im_transform.py:119-134), THEN normalize
            x = jnp.pad(x, ((0, ph - rh), (0, pw - rw), (0, 0)))
            image = normalize_device(x, preprocess_mode)
        else:
            image = normalize_device(image_u8, preprocess_mode)
        if flip:
            batch = jnp.stack([image, image[:, ::-1, :]])
        else:
            batch = image[None]
        out: ModelOutput = model.apply(params, batch)
        heat = out.heatmap
        paf = out.paf
        if flip:
            heat_avg, paf_avg = average_flip(heat[0], heat[1],
                                             paf[0], paf[1])
        else:
            heat_avg, paf_avg = heat[0], paf[0]
        people = None
        if decode:
            people = decode_poses.__wrapped__(
                heat_avg, paf_avg, factor=downsample,
                thresh_heatmap=thresh_heatmap, max_peaks=max_peaks,
                max_people=max_people, max_candidates=max_candidates,
                max_total_conns=max_total_conns, sampling=sampling,
                gaussian_filt=gaussian_filt)
        return people, heat_avg, paf_avg

    return infer


def load_pipeline(checkpoint_dir: str = None, *, torch_weights: str = None,
                  model_name: str = "vgg19", num_stages: int = 6,
                  input_size: int = 368, preprocess_mode: str = "vgg",
                  flip: bool = True, dtype=None,
                  **kwargs) -> "PosePipeline":
    """Build a serving pipeline from an orbax checkpoint dir (best step) or
    a reference torch .pth/.ckpt.  Architecture settings must match the
    checkpoint (model_name/num_stages)."""
    import jax

    from ..models import get_model

    if checkpoint_dir and torch_weights:
        raise ValueError(
            "pass checkpoint_dir OR torch_weights, not both — silently "
            "preferring one would evaluate the wrong model")
    dtype = dtype or jnp.bfloat16
    model = get_model(model_name, num_stages=num_stages, dtype=dtype)
    if not checkpoint_dir or torch_weights:
        # jitted: eager init pays a per-op dispatch/compile RTT on tunnel
        # backends (hundreds of tiny programs); one program caches well.
        # The dummy input must satisfy the model's spatial constraint
        # (pad_factor, e.g. 64 for hourglass), like every served frame —
        # a raw non-divisible input_size would crash the trace.
        pf = kwargs.get("pad_factor", 0) or kwargs.get("downsample", 8)
        init_size = input_size + (-input_size % pf)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, init_size, init_size, 3)))
    if torch_weights:
        from ..models.import_torch import (import_rtpose_state_dict,
                                           load_torch_checkpoint)
        sd = load_torch_checkpoint(torch_weights)
        params = jax.tree_util.tree_map(
            jnp.asarray, import_rtpose_state_dict(sd, params))
    elif checkpoint_dir:
        # params-only restore: no Trainer construction (which would both
        # compile a throwaway model.init and need the training-time
        # optimizer config to rebuild the opt_state pytree)
        from ..train.checkpoint import CheckpointManager
        ckpt_params, model_state, _meta = CheckpointManager(
            checkpoint_dir).restore_params()
        variables = {"params": ckpt_params}
        variables.update(model_state)
        params = jax.tree_util.tree_map(jnp.asarray, variables)
    return PosePipeline(model, params, input_size=input_size,
                        preprocess_mode=preprocess_mode, flip=flip,
                        **kwargs)


class PosePipeline:
    """High-level API: BGR uint8 numpy image in, list of people out.

    The TPU-native analogue of reference evaluate/coco_eval.py:80-114
    (get_outputs) + lib/utils/paf_to_pose.py:372-406 (paf_to_pose_cpp),
    with normalization + flip TTA fused into the same jitted call.
    """

    def __init__(self, model, params, *, input_size: int = 368,
                 downsample: int = 8, preprocess_mode: str = "vgg",
                 flip: bool = True, thresh_heatmap: float = 0.1,
                 max_peaks: int = 32, max_people: int = 64,
                 max_candidates: int = 256, max_total_conns: int = 160,
                 mesh=None, gaussian_filt: bool = False,
                 auto_retry: bool = True, retry_caps: Optional[Dict] = None,
                 device_resize: bool = False, pad_factor: int = 0):
        """`mesh`: optional jax.sharding.Mesh with a `data` axis — batched
        serving/eval (`run_batch*`) then shards frames across chips and
        XLA runs forward + decode data-parallel (the serving analogue of
        the trainer's DataParallel replacement, SURVEY.md §2.3; the
        reference can only DataParallel the forward, its C++ grouping is
        single-image host code).  Single-image `run` stays single-device.
        On sharded meshes the decode uses the XLA one-hot sampler
        (pallas_call has no GSPMD partitioning rule).

        `auto_retry` (default on): when a frame overflows a fixed-shape
        decode cap (People.truncated), automatically re-decode its maps —
        still on device — at the soak-validated raised caps (RETRY_CAPS,
        overridable via `retry_caps`) instead of silently dropping people.
        One extra decode dispatch for the rare crowded frame, no second
        forward.  meta['retried'] marks retried frames; meta['truncated']
        reports the POST-retry state (True only if even the raised caps
        overflowed).

        `device_resize`: ship the RAW native-resolution uint8 frame and run
        crop_with_factor's scale+pad in-graph (cv2-INTER_LINEAR-parity
        bilinear) before normalization.  Cuts H2D bytes ~2.4x and doubles
        pipelined video FPS for frames smaller than input_size (240x320:
        62 -> 123 FPS median, scripts/bench_device_resize.py) in the
        transfer-bound serving regime.  'auto' ships raw only when
        upscaling and keeps the host resize when the frame is LARGER than
        input_size (the downscale then ships fewer bytes)."""
        from ..utils.compile_cache import enable as _enable_compile_cache
        _enable_compile_cache()
        self.model = model
        self.mesh = mesh
        if mesh is not None and mesh.size > 1:
            from ..parallel import mesh as pmesh
            params = pmesh.replicate(mesh, params)
        self.params = params
        self.input_size = input_size
        self.downsample = downsample
        # pad_factor: spatial multiple the padded input must satisfy.
        # Defaults to the output stride; hourglass needs 64 (stride-4 stem
        # x 4 exact pool/upsample halvings) while its outputs stay stride 4
        self.pad_factor = pad_factor or downsample
        self.preprocess_mode = preprocess_mode
        self.flip = flip
        self.device_resize = device_resize
        kwargs = dict(preprocess_mode=preprocess_mode,
                      thresh_heatmap=thresh_heatmap, max_peaks=max_peaks,
                      max_people=max_people, downsample=downsample,
                      max_candidates=max_candidates,
                      max_total_conns=max_total_conns,
                      gaussian_filt=gaussian_filt,
                      device_resize_to=input_size if device_resize else 0,
                      pad_factor=self.pad_factor)
        self._infer_kwargs = kwargs
        self._infer = make_infer_fn(model, flip=flip, **kwargs)
        # maps-only fn for the multi-scale paths: those prep every scale on
        # host (each scale has a different resize target), so the in-graph
        # device resize must stay OFF here — with device_resize_to set it
        # would resize every scale back to input_size and silently collapse
        # the TTA to single-scale
        self._infer_maps = make_infer_fn(model, flip=flip, decode=False,
                                         **{**kwargs, "device_resize_to": 0})
        self._decode_only = functools.partial(
            decode_poses, factor=downsample, thresh_heatmap=thresh_heatmap,
            max_peaks=max_peaks, max_people=max_people,
            max_candidates=max_candidates, max_total_conns=max_total_conns,
            gaussian_filt=gaussian_filt)
        self._ms_cache: Dict[tuple, Any] = {}
        self.auto_retry = auto_retry
        caps = dict(RETRY_CAPS)
        caps.update(retry_caps or {})
        self.retry_caps = caps
        self._decode_retry = functools.partial(
            decode_poses, factor=downsample, thresh_heatmap=thresh_heatmap,
            gaussian_filt=gaussian_filt, **caps)

    def __call__(self, image_bgr: np.ndarray) -> List[Dict[str, Any]]:
        people, _, _, _meta = self.run(image_bgr)
        return people

    def _retry_if_truncated(self, people_host, heat, paf, meta):
        """Single-frame truncation contract: when a fixed-shape decode cap
        overflowed, re-decode the still-on-device maps at the raised caps
        (one extra dispatch, no second forward) and record the outcome in
        meta — the functional analogue of the reference's unbounded C++
        vectors (pafprocess.cpp:24-43)."""
        if self.auto_retry and bool(people_host.truncated):
            people_host = jax.device_get(self._decode_retry(heat, paf))
            meta["retried"] = True
        meta["truncated"] = bool(people_host.truncated)
        return people_host

    def _prep(self, image_bgr: np.ndarray):
        if self.device_resize:
            h, w = image_bgr.shape[:2]
            if (self.device_resize == "auto"
                    and min(h, w) >= self.input_size
                    and self.input_size % self.pad_factor == 0):
                # downscale regime: the host resize SHRINKS the frame, so
                # shipping the resized/padded image is the smaller transfer.
                # The device program still runs (identity resize + pad 0)
                # on it correctly since min side == input_size.  Requires
                # input_size % downsample == 0: otherwise the host pad
                # raises the min side above input_size and the in-graph
                # program would re-resize the already-prepped frame while
                # meta still describes the host geometry — ship raw then.
                return self._prep_host(image_bgr)
            # ship the raw frame; the jitted program scales+pads in-graph
            # with the SAME shape arithmetic (shared helper)
            scale, rh, rw, ph, pw = scale_pad_geometry(
                h, w, self.input_size, self.pad_factor)
            meta = {"scale": scale, "real_shape": (rh, rw, 3),
                    "padded_shape": (ph, pw, 3)}
            return np.ascontiguousarray(image_bgr, np.uint8), meta
        return self._prep_host(image_bgr)

    def _prep_host(self, image_bgr: np.ndarray):
        im, scale, real_shape = crop_with_factor(
            image_bgr, self.input_size, factor=self.pad_factor,
            is_ceil=True)
        meta = {"scale": scale, "real_shape": real_shape,
                "padded_shape": im.shape}
        return im.astype(np.uint8), meta

    def run(self, image_bgr: np.ndarray):
        """Returns (people list, heat, paf, meta).

        people entries: {'parts': {part: (x_norm, y_norm, score)},
        'score': float}; coordinates normalized by the padded upsampled
        frame, meta carries scale for mapping back to original pixels.
        """
        im, meta = self._prep(image_bgr)
        people_dev, heat, paf = self._infer(self.params, jnp.asarray(im))
        h_up = heat.shape[0] * self.downsample
        w_up = heat.shape[1] * self.downsample
        # ONE bundled readback for people + both maps — each separate
        # np.asarray/device_get pays a full tunnel RTT (~30 ms); the
        # device heat/paf refs stay valid for the truncation retry
        people_host, heat_h, paf_h = jax.device_get(
            (people_dev, heat, paf))
        people_host = self._retry_if_truncated(people_host, heat, paf,
                                               meta)
        people = people_to_numpy(people_host, w_up, h_up)
        meta["upsampled"] = (h_up, w_up)
        return people, np.asarray(heat_h), np.asarray(paf_h), meta

    def run_batch(self, images_bgr):
        """Batched serving: one jitted call per padded shape, people lists
        per frame.  Same-shape frames (a fixed-resolution video stream)
        run as a single batch; mixed shapes are grouped into per-shape
        async sub-batches (see run_batch_submit)."""
        # submit + immediate collect; ONE whole-batch readback (per-frame
        # per-field np.asarray costs a full tunnel RTT each — ~30 ms x 5
        # fields x B frames dominated video serving before this)
        return self.run_batch_collect(self.run_batch_submit(images_bgr))

    def run_batch_submit(self, images_bgr):
        """Enqueue one batch on the device WITHOUT blocking on results.

        Pair with :meth:`run_batch_collect`; keeping one submitted batch in
        flight while collecting the previous one overlaps host->device
        transfer + compute with readback (the video/streaming serving
        shape — demo/video_demo.py).  A mixed-shape batch is grouped by
        padded shape into per-shape async sub-batches (one compiled
        program per shape, all submitted before any readback), keeping the
        pipeline instead of degrading to serial per-image dispatch."""
        if not images_bgr:
            return ("multi", 0, [])     # empty ticket; collect -> ([], [])
        ims, metas = zip(*(self._prep(im) for im in images_bgr))
        if len({im.shape for im in ims}) != 1:
            groups: Dict[tuple, list] = {}
            for i, im in enumerate(ims):
                groups.setdefault(im.shape, []).append(i)
            sub = [(idxs, self._submit_stacked([ims[i] for i in idxs],
                                               [metas[i] for i in idxs]))
                   for idxs in groups.values()]
            return ("multi", len(ims), sub)
        return self._submit_stacked(list(ims), list(metas))

    def _submit_stacked(self, ims, metas):
        stacked = np.stack(ims)
        sharded = self.mesh is not None and self.mesh.size > 1
        if sharded:
            # pad to a multiple of the data axis; collect slices by metas,
            # so the pad frames are computed and discarded
            n_data = self.mesh.shape["data"]
            pad = -len(ims) % n_data
            if pad:
                stacked = np.concatenate(
                    [stacked, np.repeat(stacked[-1:], pad, axis=0)])
        batch = jnp.asarray(stacked)
        if not hasattr(self, "_infer_batch"):
            single = make_infer_fn(
                self.model, flip=self.flip,
                sampling="onehot" if sharded else "auto",
                **self._infer_kwargs)
            fn = lambda p, b: jax.vmap(  # noqa: E731
                lambda im: single.__wrapped__(p, im))(b)
            if sharded:
                from ..parallel import mesh as pmesh
                data_sh = pmesh.batch_sharding(self.mesh)
                self._infer_batch = jax.jit(
                    fn, in_shardings=(pmesh.replicated(self.mesh), data_sh),
                    out_shardings=data_sh)
            else:
                self._infer_batch = jax.jit(fn)
        people_dev, heat, paf = self._infer_batch(self.params, batch)
        # paf rides in the ticket so a truncated frame can be re-decoded
        # from the still-on-device maps at collect time
        return ("async", people_dev, heat, paf, list(metas))

    def run_batch_collect(self, submitted):
        """Block on a :meth:`run_batch_submit` ticket -> (people, metas)."""
        if submitted[0] == "multi":
            # mixed-shape batch: collect each per-shape sub-batch and
            # reassemble results in the original frame order
            _, n, sub = submitted
            people = [None] * n
            metas = [None] * n
            for idxs, ticket in sub:
                p, m = self.run_batch_collect(ticket)
                for j, i in enumerate(idxs):
                    people[i] = p[j]
                    metas[i] = m[j]
            return people, metas
        _, people_dev, heat, paf, metas = submitted
        h_up = heat.shape[1] * self.downsample
        w_up = heat.shape[2] * self.downsample
        people_host = jax.device_get(people_dev)
        trunc = np.asarray(people_host.truncated)[:len(metas)]
        retry_host, retry_pos = None, {}
        if self.auto_retry and trunc.any():
            # one extra batched decode dispatch covering the truncated
            # frames, from the still-on-device maps (no second forward).
            # The row selection is PADDED to the full batch size (repeating
            # the first truncated frame): a k-row retry batch would compile
            # one XLA program PER DISTINCT k — measured 8-15 s per new k on
            # the tunnel TPU, which dwarfed the decode it replaced on
            # crowd-dense eval (scripts/crowded_eval_bench.py). Fixed-shape
            # padding means exactly one retry program per bucket shape; the
            # wasted decode rows cost ~0.6 ms each.
            idxs = np.nonzero(trunc)[0]
            pad = np.full(heat.shape[0] - len(idxs), idxs[0],
                          dtype=idxs.dtype)
            sel = jnp.asarray(np.concatenate([idxs, pad]))
            sharded = self.mesh is not None and self.mesh.size > 1
            caps = dict(self.retry_caps)
            caps.setdefault("sampling", "onehot" if sharded else "auto")
            retry_dev = decode_poses_batch(
                heat[sel], paf[sel], factor=self.downsample,
                thresh_heatmap=self._infer_kwargs["thresh_heatmap"],
                gaussian_filt=self._infer_kwargs["gaussian_filt"],
                **caps)
            retry_host = jax.device_get(retry_dev)
            retry_pos = {int(g): j for j, g in enumerate(idxs)}
        out = []
        for i, meta in enumerate(metas):
            meta["upsampled"] = (h_up, w_up)
            if i in retry_pos:
                j = retry_pos[i]
                meta["retried"] = True
                meta["truncated"] = bool(retry_host.truncated[j])
                src, k = retry_host, j
            else:
                meta["truncated"] = bool(people_host.truncated[i])
                src, k = people_host, i
            sub = People(
                coords=src.coords[k], part_score=src.part_score[k],
                score=src.score[k], valid=src.valid[k],
                truncated=src.truncated[k])
            out.append(people_to_numpy(sub, w_up, h_up))
        return out, metas

    def _prep_scales(self, image_bgr, scales):
        # multi-scale TTA preps every scale on host (the per-scale resize
        # targets differ; device_resize only covers the single-scale path).
        # The base-grid shape + meta come from the shared geometry helper —
        # resizing the full frame just to read its shape would burn a cv2
        # resize per call on the single-core host
        h, w = image_bgr.shape[:2]
        scale, rh, rw, ph, pw = scale_pad_geometry(
            h, w, self.input_size, self.pad_factor)
        meta = {"scale": scale, "real_shape": (rh, rw, 3),
                "padded_shape": (ph, pw, 3)}
        bh = ph // self.downsample
        bw = pw // self.downsample
        ims = []
        for s in scales:
            size = max(self.pad_factor, int(round(self.input_size * s)))
            im, _, _ = crop_with_factor(image_bgr, size,
                                        factor=self.pad_factor)
            ims.append(im.astype(np.uint8))
        return ims, (bh, bw), meta

    def _multiscale_fn(self, n_scales: int, base_hw: tuple):
        """One jitted program: n_scales forwards (each with fused flip TTA)
        -> in-graph bicubic resize to the base grid -> average -> decode.
        Host does nothing but resize/pad the uint8 inputs.

        Cached per instance: an lru_cache on the method would key on
        `self` in a class-level cache, keeping dead pipelines (and their
        device params + executables) alive until eviction."""
        key = (n_scales, tuple(base_hw))
        cached = self._ms_cache.get(key)
        if cached is not None:
            return cached
        from ..ops.resize import resize_bicubic
        infer_maps = self._infer_maps

        @jax.jit
        def run(params, *images_u8):
            heats, pafs = [], []
            for im in images_u8:
                _, heat, paf = infer_maps.__wrapped__(params, im)
                heats.append(resize_bicubic(heat, base_hw))
                pafs.append(resize_bicubic(paf, base_hw))
            heat_avg = sum(heats) / len(heats)
            paf_avg = sum(pafs) / len(pafs)
            people = self._decode_only.func.__wrapped__(
                heat_avg, paf_avg, **self._decode_only.keywords)
            return people, heat_avg, paf_avg

        self._ms_cache[key] = run
        return run

    def run_multiscale(self, image_bgr: np.ndarray,
                       scales=(0.5, 1.0, 1.5, 2.0)):
        """Multi-scale + flip TTA in ONE device dispatch: per-scale CNN
        forwards, cv2-parity bicubic map resize to the base grid, averaging
        and grouping all inside a single XLA program (the reference's
        unused multi-scale scaffolding, coco_eval.py:107; round 1 averaged
        on host with cv2)."""
        ims, (bh, bw), meta = self._prep_scales(image_bgr, scales)
        fn = self._multiscale_fn(len(scales), (bh, bw))
        people_dev, heat_avg, paf_avg = fn(
            self.params, *(jnp.asarray(im) for im in ims))
        h_up, w_up = bh * self.downsample, bw * self.downsample
        # ONE bundled readback for people + both averaged maps (device
        # refs stay valid for the truncation retry)
        people_host, heat_h, paf_h = jax.device_get(
            (people_dev, heat_avg, paf_avg))
        people_host = self._retry_if_truncated(people_host, heat_avg,
                                               paf_avg, meta)
        meta["upsampled"] = (h_up, w_up)
        people = people_to_numpy(people_host, w_up, h_up)
        return people, np.asarray(heat_h), np.asarray(paf_h), meta

    def run_multiscale_host(self, image_bgr: np.ndarray,
                            scales=(0.5, 1.0, 1.5, 2.0)):
        """Host-averaged multi-scale path (cv2 resize per scale): the
        differential oracle for run_multiscale."""
        import cv2
        ims, (bh, bw), meta = self._prep_scales(image_bgr, scales)
        heat_sum = paf_sum = None
        for im in ims:
            _, heat, paf = self._infer_maps(self.params, jnp.asarray(im))
            if heat_sum is None:   # channel counts follow the model
                heat_sum = np.zeros((bh, bw, heat.shape[-1]), np.float32)
                paf_sum = np.zeros((bh, bw, paf.shape[-1]), np.float32)
            heat_sum += cv2.resize(np.asarray(heat), (bw, bh),
                                   interpolation=cv2.INTER_CUBIC)
            paf_sum += cv2.resize(np.asarray(paf), (bw, bh),
                                  interpolation=cv2.INTER_CUBIC)
        heat_avg = heat_sum / len(scales)
        paf_avg = paf_sum / len(scales)
        heat_d, paf_d = jnp.asarray(heat_avg), jnp.asarray(paf_avg)
        people_host = self._retry_if_truncated(
            jax.device_get(self._decode_only(heat_d, paf_d)),
            heat_d, paf_d, meta)
        h_up, w_up = bh * self.downsample, bw * self.downsample
        meta["upsampled"] = (h_up, w_up)
        people = people_to_numpy(people_host, w_up, h_up)
        return people, heat_avg, paf_avg, meta

    def _multiscale_batch_fn(self, n_scales: int, base_hw: tuple):
        """Batched variant of :meth:`_multiscale_fn`: one jitted program
        running n_scales BATCHED forwards (each (B, Hs, Ws, 3) uint8,
        flip TTA fused inside), in-graph bicubic resize of every map to
        the base grid, averaging, and one batched decode.  Composes the
        round-2 fused multi-scale TTA with the bucketed batch eval so
        --multiscale no longer serializes ~5,000 single-image dispatches
        over the ~30 ms tunnel RTT (round-4 verdict item 3)."""
        key = ("batch", n_scales, tuple(base_hw))
        cached = self._ms_cache.get(key)
        if cached is not None:
            return cached
        from ..ops.resize import resize_bicubic
        infer_maps = self._infer_maps
        dk = dict(self._decode_only.keywords)
        sharded = self.mesh is not None and self.mesh.size > 1
        if sharded:
            # pallas_call has no GSPMD partitioning rule; the XLA one-hot
            # sampler shards cleanly over the data axis (same choice as
            # the flip-only sharded path, _submit_stacked)
            dk["sampling"] = "onehot"

        def run(params, *batches_u8):
            heats, pafs = [], []
            for b in batches_u8:
                h, p = jax.vmap(
                    lambda im: infer_maps.__wrapped__(params, im)[1:])(b)
                heats.append(jax.vmap(
                    lambda m: resize_bicubic(m, base_hw))(h))
                pafs.append(jax.vmap(
                    lambda m: resize_bicubic(m, base_hw))(p))
            heat_avg = sum(heats) / len(heats)
            paf_avg = sum(pafs) / len(pafs)
            people = decode_poses_batch.__wrapped__(heat_avg, paf_avg,
                                                    **dk)
            return people, heat_avg, paf_avg

        if sharded:
            from ..parallel import mesh as pmesh
            data_sh = pmesh.batch_sharding(self.mesh)
            run = jax.jit(run,
                          in_shardings=(pmesh.replicated(self.mesh),)
                                       + (data_sh,) * n_scales,
                          out_shardings=data_sh)
        else:
            run = jax.jit(run)
        self._ms_cache[key] = run
        return run

    def _submit_multiscale_stacked(self, preps, scales):
        base_hw = preps[0][1]
        metas = [dict(meta) for _, _, meta in preps]
        pad = 0
        if self.mesh is not None and self.mesh.size > 1:
            # pad to a multiple of the data axis like _submit_stacked;
            # run_batch_collect slices results back to len(metas)
            pad = -len(preps) % self.mesh.shape["data"]
        stacks = []
        for s in range(len(scales)):
            stacked = np.stack([ims[s] for ims, _, _ in preps])
            if pad:
                stacked = np.concatenate(
                    [stacked, np.repeat(stacked[-1:], pad, axis=0)])
            stacks.append(jnp.asarray(stacked))
        batches = tuple(stacks)
        fn = self._multiscale_batch_fn(len(scales), base_hw)
        people_dev, heat_avg, paf_avg = fn(self.params, *batches)
        # same async ticket shape as run_batch_submit: run_batch_collect
        # handles the readback AND the fixed-shape truncation retry from
        # the still-on-device averaged maps
        return ("async", people_dev, heat_avg, paf_avg, metas)

    def ms_chunk_cap(self, max_px: int) -> int:
        """Largest frame count per stacked multi-scale chunk for a bucket
        whose biggest scaled image is `max_px` pixels (the v5e HBM guard,
        see MS_PIXEL_BUDGET). The budget is calibrated for bf16 compute;
        the dominant conv temporaries scale with the compute dtype's
        width, so an f32 model halves the cap. On a sharded mesh the
        batch splits over the `data` axis, so the cap scales with the
        number of data-parallel devices (the budget is per-chip HBM)."""
        dtype_bytes = jnp.dtype(
            getattr(self.model, "dtype", None) or jnp.float32).itemsize
        n_data = (self.mesh.shape.get("data", 1)
                  if self.mesh is not None else 1)
        return max(1, n_data * ((MS_PIXEL_BUDGET * 2 // dtype_bytes)
                                // max_px))

    def run_multiscale_batch_submit(self, images_bgr,
                                    scales=(0.5, 1.0, 1.5, 2.0)):
        """Enqueue one multi-scale TTA batch without blocking; collect
        with :meth:`run_batch_collect`.  Frames whose per-scale padded
        shapes differ are grouped into per-shape async sub-batches like
        run_batch_submit (the eval harness pre-buckets by these shapes,
        so its chunks always land in one group).

        Each stacked chunk is additionally capped so that
        ``B * max-scale H*W <= MS_PIXEL_BUDGET``: the stacked program holds
        every scale's full batched forward (with flip fused, so 2B frames),
        and extreme-aspect val2017 buckets at scale 1.5 otherwise exceed
        v5e HBM — measured: 16 frames at max-scale (576, 1920) compiled to
        a 16.9 GiB program (conv1_1 activation bf16[32,576,1920,64] alone
        is 8.44 GiB) vs 15.75 GiB available.

        With a mesh (PosePipeline(..., mesh=)), each stacked chunk shards
        over the `data` axis (batch padded to a multiple of it) and the
        fused multi-scale forward + decode run SPMD."""
        if not images_bgr:
            return ("multi", 0, [])
        preps = [self._prep_scales(im, scales) for im in images_bgr]
        keys = [(bhw,) + tuple(im.shape for im in ims)
                for ims, bhw, _ in preps]
        groups: Dict[tuple, list] = {}
        for i, k in enumerate(keys):
            groups.setdefault(k, []).append(i)
        sub = []
        for idxs in groups.values():
            max_px = max(im.shape[0] * im.shape[1]
                         for im in preps[idxs[0]][0])
            cap = self.ms_chunk_cap(max_px)
            for j in range(0, len(idxs), cap):
                part = idxs[j:j + cap]
                sub.append((part, self._submit_multiscale_stacked(
                    [preps[i] for i in part], scales)))
        if len(sub) == 1 and len(sub[0][0]) == len(preps):
            return sub[0][1]
        return ("multi", len(preps), sub)

    def run_multiscale_batch(self, images_bgr,
                             scales=(0.5, 1.0, 1.5, 2.0)):
        """Batched multi-scale TTA: submit + immediate collect."""
        return self.run_batch_collect(
            self.run_multiscale_batch_submit(images_bgr, scales))

    def keypoints_pixels(self, people, meta):
        """Map normalized part coords back to original-image pixels.

        x_pix = x_norm * (W_up / scale) + 0.5 — the reference's
        append_result convention (coco_eval.py:136-148, upsample_keypoints
        :279)."""
        h_up, w_up = meta["upsampled"]
        scale = meta["scale"]
        out = []
        for person in people:
            parts = {}
            for part, (xn, yn, s) in person["parts"].items():
                parts[part] = (xn * w_up / scale + 0.5,
                               yn * h_up / scale + 0.5, s)
            out.append({"parts": parts, "score": person["score"]})
        return out
