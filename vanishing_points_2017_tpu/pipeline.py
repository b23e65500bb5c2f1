"""End-to-end pipeline: image -> lines -> sphere -> CNN -> EM -> horizon.

Where the reference chains four separate passes through on-disk pickles with
three process/language boundaries (SURVEY §3.1 of the analysis of
fkluger/vanishing_points_2017: ImageMagick subprocess -> Cython LSD ->
matplotlib Agg -> Caffe GPU -> NumPy EM), this pipeline has exactly one host
stage (LSD on the ingested image) and ONE fused XLA program for everything
after it: sphere render, CNN forward, EM refinement and horizon estimation
compile into a single jit function, vmapped over image batches and
shardable over a device mesh (batch axis on ``dp``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from .data import io as dio
from .em import EMConfig, expectation_maximisation
from .em.horizon import calculate_horizon_and_ortho_vp
from .models import cnn as cnn_mod
from .ops import lines as lineops
from .ops import sphere as sphere_mod


BUCKETS = (512, 1024, 2048)


def select_bucket(n: int, buckets: tuple = BUCKETS) -> int:
    """Smallest static line-count bucket that fits n (largest if none do)."""
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    sphere_size: int = 500
    n_pad: int = 512             # default line-count bucket (static shape)
    buckets: tuple = BUCKETS     # auto-selected buckets (Pipeline.ingest)
    em: EMConfig = EMConfig()
    maxbest: int = 20            # best VPs for the horizon search
    theta_vmin: float = float(np.pi / 10)
    # Zenith position-gate relaxation for near-ideal vertical VPs
    # (calculate_horizon_and_ortho_vp's pos_gate_ideal_tol): when the
    # zenith VP lies farther than this many half-frames from the image
    # centre, which SIDE it lies on is f32 segment noise, and the
    # reference's zenithPos*horPos gate would reject the strongest
    # zenith's whole triplet family on exactly the photos where it
    # matters (the ihme knife edge, BASELINE.md). 8.0 measured
    # equivalent to 4/16 on all bundled reference photos; inf restores
    # exact reference gating.
    horizon_pos_gate_tol: float = 8.0
    renderer: str = "xla"        # "xla" | "pallas" (TPU-only kernel)
    cnn_dtype: str = "bfloat16"  # inference conv/fc compute dtype; the CNN
    # output is a soft 20x20 prior, bf16 on the MXU halves its HBM traffic
    # (training runs bf16 already; "float32" restores exact r1 numerics)
    # Device-detector CCL kernel implementation (device_pipeline_full
    # only). None = backend default (Pallas on TPU, overridable via the
    # VP_CCL_IMPL env var read at trace time); explicit "xla"/"pallas"
    # is part of the jit static key, so it composes with nested-jit
    # trace caching where an env flip would silently not
    # (parallel/inference.py relies on this to force the partitionable
    # XLA impl under GSPMD).
    ccl_impl: str | None = None
    # Device-detector noise gates, arbitrated jointly over the
    # reference's bundled REAL photographs (vs its published result
    # figures) and 16 rendered synthetic scenes
    # (scripts/sweep_detector_gates.py + /tmp diag logs, round 3):
    # count/length alone cannot cover both domains (fixed 20/20 fixes
    # the facades but over-prunes the glass-roof atrium), while LSD's
    # region-to-rectangle DENSITY test (its 0.7 constant) rejects the
    # meandering micro-texture chains that tilt real-photo horizons AND
    # improves synthetic AUC (0.9769 vs 0.9750). Measured at these
    # defaults: photo horizon err 0.043/0.039/0.003, host-LSD path
    # 0.011/0.017/0.002 (tests/test_real_photos.py).
    det_min_count: int = 15
    det_min_len_px: float = 12.0
    det_min_density: float = 0.7
    # Run-record selection strategy. "global" (default) = one image-wide
    # top-max_records by run mass — chip-measured faster than the row
    # budget (whole detector ~2.2 ms/img device at batch 16 with a 16k
    # budget vs ~3.5 row; see BASELINE.md for the budget sweep) with
    # synthetic AUC within 0.005 of the host-LSD path. Through round 3 it was
    # opt-in because its slightly different f32 record order flipped the
    # EM's knife-edge zenith split on the reference's texture-heavy ihme
    # facade (horizon err 0.45 vs 0.05); that knife edge traced to the
    # reference's own zenith side gate rejecting near-ideal vertical VPs
    # (horizon_pos_gate_tol above) — with the waiver in place global is
    # equal-or-better on every bundled reference photo
    # (0.040/0.009/0.005 vs row's 0.037/0.039/0.003; BASELINE.md round-4
    # section). "row" = per-row top-runs_per_row budget, kept as the
    # fallback whose record set is independent of image-global
    # statistics (a row's records never change because a DIFFERENT image
    # region got denser).
    # The 32768 budget is load-bearing on real photos: texture-dense
    # scenes carry 30-50k nonzero runs (p99 142 runs/row at 640 px), and
    # a 16384 budget drops enough weak-but-structural runs to move the
    # horizon (0.188 vs 0.040 on a bundled reference photo — CPU
    # measurement, round 4). Synthetic scenes fit in 16384; only
    # synthetic-only throughput deployments should lower it.
    det_selection: str = "global"
    det_max_records: int = 32768
    # Global-selection top-k implementation: "exact" (bit-exact full
    # top_k) or "approx" (jax.lax.approx_max_k, the TPU-native
    # PartialReduce — chip-measured ~3 ms/batch-of-16 cheaper inside the
    # whole detector where the exact chains cost ~1.5 ms/img). approx
    # keeps the exact candidate SET whenever the image holds <=
    # det_max_records nonzero runs (all synthetic scenes); above the
    # budget it may miss ~1% of records near the mass boundary —
    # measured recall 1.0000 on a dense 57k-candidate input. DEFAULT
    # since round 5: the chip re-validation gate passed with outputs
    # identical to exact (real photos 0.040/0.009/0.005, synthetic gap
    # +0.0044 — BASELINE.md round-5). "exact" remains the bit-exact
    # fallback; on CPU backends approx lowers to the exact sort anyway.
    det_topk: str = "approx"
    # Bootstrap-consensus horizon (em/consensus.py): 0/1 = off (the
    # reference-parity single EM — the production default), K > 1 = run
    # K bootstrap resamples of the segment population through EM +
    # horizon search inside the fused program (vmapped — one wider XLA
    # program, no extra dispatches) and report the medoid member.
    # Measurably tames the knife-edge triplet flips the perturbation
    # harness pins (BASELINE.md round-5 consensus table); opt-in
    # because it multiplies EM compute by K and is a deliberate
    # behavioral deviation from the reference (PARITY.md).
    horizon_consensus: int = 0
    consensus_seed: int = 0
    # "dropout" (each member keeps a random 85% subset — the measured
    # winner: strictly fewer knife-edge flips than single-EM on every
    # probed photo) or "bootstrap" (with-replacement resample — a
    # harsher perturbation that ADDS flips on drift-sensitive
    # populations; BASELINE.md round-5 consensus table)
    consensus_mode: str = "dropout"
    # guarded medoid: keep the base member unless it deviates from the
    # ensemble median by more than this (summed over both horizon
    # edges, normalized units); 0 = always report the medoid
    consensus_guard: float = 0.0

    def cache_key(self) -> str:
        """Config-dependent cache identity, like the reference's encoded
        folder names (``evaluation.py:60-67``)."""
        e = self.em
        # the horizon gate relaxation changes cached hp1/hp2 results, so
        # it is part of the identity (omitted at the reference-exact inf
        # so pre-existing cache keys stay valid)
        hz = ("" if self.horizon_pos_gate_tol == float("inf")
              else f"_hz{self.horizon_pos_gate_tol:g}")
        # consensus changes cached horizons; omitted at the off default
        # so pre-existing cache keys stay valid
        ck = ("" if self.horizon_consensus <= 1 else
              f"_ck{self.horizon_consensus}"
              + ("" if self.consensus_mode == "dropout"  # the default
                 else f"{self.consensus_mode}")
              + (f"g{self.consensus_guard:g}" if self.consensus_guard
                 else "")
              + (f"s{self.consensus_seed}" if self.consensus_seed else ""))
        return (f"{e.distance_measure}_{'' if e.use_weights else 'no'}weights"
                f"_{'' if e.do_split else 'no'}split"
                f"_{'' if e.do_merge else 'no'}merge_{self.sphere_size}{hz}"
                f"{ck}")

    def det_key(self) -> str:
        """Device-detector config identity — append to :meth:`cache_key`
        for cached results produced through the on-device detector
        (``benchmark.py --device_detect``), so detector-gate or
        selection-strategy changes invalidate exactly those caches and
        never the host-LSD ones (whose results don't depend on det_*).

        Includes the RESOLVED CCL impl (Pallas CCL is bit-exact vs the
        XLA raster scan — included anyway so a future impl with
        different labels cannot contaminate). Resolution mirrors the
        dispatch site in ops/lines_device.py exactly: the Pallas impl
        only ever runs when the default backend is TPU, so a CPU run
        keys as xla whatever the env says."""
        import os

        import jax
        on_tpu = jax.default_backend() == "tpu"
        ccl = self.ccl_impl or os.environ.get("VP_CCL_IMPL", "pallas")
        ccl = "xla" if (not on_tpu or ccl == "xla") else "pallas"
        # det_topk is omitted at "exact" (the bit-exact reference point):
        # exact-path caches keep their historical keys, while approx-path
        # results (the round-5 default — identical on-chip outputs but a
        # DIFFERENT algorithm above the record budget) key separately and
        # can never serve an exact-path consumer
        topk = "" if self.det_topk == "exact" else f"-{self.det_topk}"
        return (f"det{self.det_selection}{self.det_min_count}"
                f"-{self.det_min_len_px:g}-{self.det_min_density:g}"
                f"-{self.det_max_records}-{ccl}{topk}")


def pad_lines(segments: np.ndarray, n_pad: int):
    """Normalized segments -> padded (l, lp, lmask) arrays.

    Keeps the longest segments when there are more than n_pad — and SAYS SO
    (the reference has no cap, ``evaluation.py:154-169``; a silent cap would
    make dense 800-px ECD/HLW scenes quietly lose lines). Callers that want
    no truncation pick a bucket first with :func:`select_bucket`.
    """
    n = segments.shape[0]
    if n > n_pad:
        from .utils.profiling import get_logger
        get_logger().warning(
            "pad_lines: truncating %d segments to the %d longest "
            "(pick a larger bucket via PipelineConfig.buckets to keep all)",
            n, n_pad)
        length = np.hypot(segments[:, 0] - segments[:, 2],
                          segments[:, 1] - segments[:, 3])
        keep = np.sort(np.argsort(-length)[:n_pad])
        segments = segments[keep]
        n = n_pad
    lp = np.zeros((n_pad, 4), np.float32)
    lp[:n] = segments[:, :4]
    p1 = np.concatenate([lp[:n, 0:2], np.ones((n, 1), np.float32)], axis=1)
    p2 = np.concatenate([lp[:n, 2:4], np.ones((n, 1), np.float32)], axis=1)
    l = np.zeros((n_pad, 3), np.float32)
    l[:n] = np.cross(p1, p2)
    lmask = np.arange(n_pad) < n
    return l, lp, lmask


@functools.partial(jax.jit, static_argnames=("cfg",))
def device_pipeline(l: jnp.ndarray, lp: jnp.ndarray, lmask: jnp.ndarray,
                    params: Any, mean: jnp.ndarray,
                    cfg: PipelineConfig) -> dict:
    """The fused per-image program. All shapes static.

    l/lp/lmask: (N,3)/(N,4)/(N,) padded lines; params: CNN pytree; mean:
    (S, S) training mean image. Returns a dict of device arrays.
    """
    if cfg.renderer == "pallas":
        from .ops.sphere_pallas import sphere_render_pallas
        img = sphere_render_pallas(l, lmask, size=cfg.sphere_size)
        img_u8 = jnp.floor(img * 255.0).astype(jnp.uint8)
    else:
        img_u8 = sphere_mod.sphere_image_uint8(l, lmask, size=cfg.sphere_size)
    x = cnn_mod.preprocess(img_u8[None], mean)
    pred = cnn_mod.forward(params, x,
                           compute_dtype=jnp.dtype(cfg.cnn_dtype).type)[0]
    sphere_f32 = img_u8.astype(jnp.float32)
    extra: dict = {}
    if cfg.horizon_consensus > 1:
        from .em.consensus import consensus_em_horizon
        em, hz, extra = consensus_em_horizon(
            l, lp, pred, sphere_f32, lmask, cfg.em,
            k=cfg.horizon_consensus, seed=cfg.consensus_seed,
            mode=cfg.consensus_mode, guard=cfg.consensus_guard,
            maxbest=cfg.maxbest, theta_vmin=cfg.theta_vmin,
            pos_gate_ideal_tol=cfg.horizon_pos_gate_tol)
        hp1, hp2, z_vp, h_vp1, h_vp2, combo = hz
    else:
        em = expectation_maximisation(l, lp, pred, sphere_f32, lmask, cfg.em)
        hp1, hp2, z_vp, h_vp1, h_vp2, combo = calculate_horizon_and_ortho_vp(
            em.vp, em.counts, em.alive, maxbest=cfg.maxbest,
            theta_vmin=cfg.theta_vmin,
            pos_gate_ideal_tol=cfg.horizon_pos_gate_tol)
    return extra | {
        "sphere_image": img_u8,
        "cnn_prediction": pred,
        "vp": em.vp, "alive": em.alive, "counts": em.counts,
        "counts_weighted": em.counts_weighted, "vp_assoc": em.vp_assoc,
        "iterations": em.iterations, "em_valid": em.valid,
        "hp1": hp1, "hp2": hp2, "zenith_vp": z_vp,
        "horizon_vp1": h_vp1, "horizon_vp2": h_vp2, "best_combo": combo,
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def device_pipeline_batch(l, lp, lmask, params, mean, cfg: PipelineConfig):
    """vmapped fused program over an image batch — the throughput path."""
    return jax.vmap(
        lambda a, b, c: device_pipeline(a, b, c, params, mean, cfg)
    )(l, lp, lmask)


@functools.partial(jax.jit, static_argnames=("cfg",))
def device_pipeline_full(images: jnp.ndarray, params: Any, mean: jnp.ndarray,
                         cfg: PipelineConfig) -> dict:
    """The ZERO-host-round-trip program: grayscale images in, horizons out.

    Uses the on-device line detector (``ops/lines_device.py``) instead of
    the host C++ LSD, so detection + render + CNN + EM + horizon compile
    into one XLA program. images: (B, H, W) in [0, 255], uint8 or float
    (the detector casts on device — ship uint8 to quarter the H2D bytes).
    """
    from .ops.lines_device import detect_segments_device

    def one(img):
        lp, lmask = detect_segments_device(img, max_segments=cfg.n_pad,
                                           min_count=cfg.det_min_count,
                                           min_len_px=cfg.det_min_len_px,
                                           min_density=cfg.det_min_density,
                                           ccl_impl=cfg.ccl_impl,
                                           selection=cfg.det_selection,
                                           max_records=cfg.det_max_records,
                                           topk_impl=cfg.det_topk)
        l = lineops.segments_to_homogeneous(lp)
        l = jnp.where(lmask[:, None], l, 0.0)
        return device_pipeline(l, lp, lmask, params, mean, cfg)

    return jax.vmap(one)(images)


class Pipeline:
    """Host orchestration: ingest + LSD on host, everything else on device."""

    def __init__(self, params: Any = None, mean: np.ndarray | None = None,
                 cfg: PipelineConfig = PipelineConfig(),
                 rng_seed: int = 0):
        self.cfg = cfg
        if params is None:
            params = cnn_mod.init_params(jax.random.PRNGKey(rng_seed),
                                         input_size=cfg.sphere_size)
        self.params = params
        if mean is None:
            mean = np.zeros((cfg.sphere_size, cfg.sphere_size), np.float32)
        self.mean = jnp.asarray(mean, jnp.float32)

    # ---- host stages ----

    def ingest(self, image: np.ndarray | str,
               target_size: int | None = None) -> dict:
        """Load/resize/grayscale + LSD. Returns the host-side line bundle.

        The line bucket is auto-selected per image (smallest of
        ``cfg.buckets`` that fits, so nothing is truncated up to the
        largest bucket); ``process_batch`` re-pads a mixed batch to its
        largest bucket before the device call.
        """
        if isinstance(image, str):
            image = dio.load_image(image)
        if target_size is not None:
            image = dio.resize_max(image, target_size)
        gray = dio.rgb2gray(image)
        det = dio.detect_lsd_lines(gray)
        n_pad = select_bucket(det["segments"].shape[0], self.cfg.buckets)
        l, lp, lmask = pad_lines(det["segments"], n_pad)
        return {"image_shape": gray.shape, "segments": det["segments"],
                "nfa": det["nfa"], "l": l, "lp": lp, "lmask": lmask}

    def ingest_image(self, image: np.ndarray | str,
                     target_size: int | None = None) -> dict:
        """Load/resize/grayscale only — the device-detector path's host
        stage (no LSD; detection runs on device in the fused program)."""
        if isinstance(image, str):
            image = dio.load_image(image)
        if target_size is not None:
            image = dio.resize_max(image, target_size)
        gray = dio.rgb2gray(image)  # [0, 1] float, skimage-compatible
        g8 = np.clip(np.round(gray * 255.0), 0, 255).astype(np.uint8)
        return {"image_shape": gray.shape, "gray": g8}

    # ---- fused device stage ----

    def process_images(self, grays: list[np.ndarray]) -> dict:
        """Zero-host-round-trip batch: grayscale uint8 images (all the
        same HxW — group mixed-size datasets by shape; each distinct
        shape compiles its own program) -> full pipeline outputs."""
        imgs = jnp.asarray(np.stack([np.asarray(g) for g in grays]))
        return device_pipeline_full(imgs, self.params, self.mean, self.cfg)

    def run_lines(self, l, lp, lmask) -> dict:
        out = device_pipeline(jnp.asarray(l), jnp.asarray(lp),
                              jnp.asarray(lmask), self.params, self.mean,
                              self.cfg)
        return out

    def process(self, image: np.ndarray | str,
                target_size: int | None = None) -> dict:
        host = self.ingest(image, target_size)
        out = self.run_lines(host["l"], host["lp"], host["lmask"])
        out = {k: np.asarray(v) for k, v in out.items()}
        out.update(image_shape=host["image_shape"],
                   segments=host["segments"])
        return out

    def process_batch(self, bundles: list[dict]) -> dict:
        n_pad = max(int(b["l"].shape[0]) for b in bundles)

        def repad(a, fill=0):
            a = np.asarray(a)
            if a.shape[0] == n_pad:
                return a
            pad = [(0, n_pad - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
            return np.pad(a, pad, constant_values=fill)

        l = jnp.asarray(np.stack([repad(b["l"]) for b in bundles]))
        lp = jnp.asarray(np.stack([repad(b["lp"]) for b in bundles]))
        m = jnp.asarray(np.stack([repad(b["lmask"], fill=False)
                                  for b in bundles]))
        return device_pipeline_batch(l, lp, m, self.params, self.mean,
                                     self.cfg)

    def horizon_line(self, out: dict) -> np.ndarray:
        return np.cross(np.asarray(out["hp1"]), np.asarray(out["hp2"]))
