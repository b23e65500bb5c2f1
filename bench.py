#!/usr/bin/env python3
"""Throughput benchmark: HONEST end-to-end images/sec on the current device.

The headline metric INCLUDES line detection: it times the zero-host-
round-trip pipeline (grayscale image in -> Gaussian blur -> gradient ->
connected-component line detection -> inverse-gnomonic sphere render ->
CNN forward -> EM with split/merge -> horizon out), i.e. everything the
reference pipeline does after image decode (SURVEY §3.1), including the
host->device image transfer per batch.

Timing semantics (round 3): the headline is PIPELINED throughput —
every batch's H2D + compute dispatched back-to-back, all results read
back at the end, like a prefetching data loader. The serialized
latency-semantics number (round-1/2 headline) and a compute-only
device-resident number are in the breakdown. Rationale + measured
accounting: scripts/profile_e2e.py and BASELINE.md (the axon tunnel
moves ~10-30 MB/s H2D, so the serialized loop is transfer-bound while
the pipelined loop is compute-bound).

Prints ONE JSON line with the required keys {"metric", "value", "unit",
"vs_baseline"} plus a "breakdown" object (stage splits, FLOPs/img, MFU
estimate) and "baseline_note" marking the denominator as an estimate.

ARCHITECTURE (round 3): a deadline-supervised parent + worker
subprocesses. Round 2's official capture timed out (BENCH_r02.json
rc=124, parsed=null) because the axon remote-compile service starved on
composed programs for ~25 min per attempt and bench.py had retry sleeps
but no global deadline. Now:

  - the PARENT never imports jax (cannot be wedged by the TPU grant).
    It enforces a global wall-clock deadline (env BENCH_DEADLINE,
    default 900 s) and ALWAYS emits the one-line JSON before it —
    with a "degraded": true marker when the TPU path did not land.
  - a CPU-backend worker starts IMMEDIATELY in parallel (it never
    touches the TPU): a guaranteed-landing fallback number (~2-4 min).
  - TPU attempts are SEQUENTIAL (one grant at a time) and ordered
    bank-first (round 4): the three-program orchestration runs FIRST —
    its programs are the smallest, so it has the best odds against the
    axon platform's highly variable per-program first-execution setup
    (50-600 s) — and banks a full-pipeline TPU number on a fresh
    grant. Only after it lands does the headline attempt (the fused
    single program) get the remaining deadline. The previous layout
    (headline first, fallback after) lost BOTH in slow windows: the
    killed headline wedges the TPU grant for 3-5 min, which then ate
    the fallback's slice.
  - SIGTERM/SIGINT on the parent (e.g. the driver's own timeout) emits
    the best result so far, then exits 0.

Baseline: the reference publishes no numbers (BASELINE.md). Its per-image
cost on CPU is dominated by the EM's O(N^2) Python loops plus Agg
rendering and Caffe; the documented working estimate is 0.2 images/s.
The reference cannot run in this image (Python 2 + Caffe), so
vs_baseline is an ESTIMATE, not a measurement.

Env knobs: BENCH_DEADLINE (s), BENCH_BATCH, BENCH_ITERS,
BENCH_IMAGE_SIZE, BENCH_DET_SELECTION
(row|global record selection), BENCH_FUSED=0 (two-program split
instead of the default fused single program), BENCH_BREAKDOWN=1 (adds
the lines->horizon fused split, a second server setup on axon),
BENCH_PEAK_FLOPS, BENCH_CPU_FALLBACK=0 (skip the parallel CPU worker),
BENCH_BANKER=0 (skip the bank-first three-program attempt and start
the headline attempt immediately — e.g. for cache-warming runs),
BENCH_T1_SLICE (cap the headline attempt's slice; default = all
remaining deadline).
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_IMAGES_PER_SEC = 0.2  # documented estimate, see BASELINE.md

_START = time.time()


def _deadline() -> float:
    return float(os.environ.get("BENCH_DEADLINE", "900"))


def _remaining() -> float:
    return _deadline() - (time.time() - _START)


# --------------------------------------------------------------------------
# worker: does the actual measurement on one backend/orchestration
# --------------------------------------------------------------------------

def measure(platform: str, split: str, batch: int, iters: int, size: int,
            breakdown: bool) -> dict:
    """Compile + time one orchestration; returns the full record dict."""
    if platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from vanishing_points_2017_tpu.utils import compile_cache
    compile_cache.enable()

    from vanishing_points_2017_tpu.models import synth
    from vanishing_points_2017_tpu.data.datasets import render_scene_image
    from vanishing_points_2017_tpu.pipeline import (Pipeline, PipelineConfig,
                                                    device_pipeline_batch,
                                                    device_pipeline_full,
                                                    pad_lines)
    from vanishing_points_2017_tpu import weights as wload

    cfg = PipelineConfig()
    if os.environ.get("BENCH_DET_SELECTION"):
        # override PipelineConfig.det_selection ("row" benches the
        # per-row-budget fallback; the default benches the production
        # default, "global" since round 4).
        import dataclasses
        cfg = dataclasses.replace(
            cfg, det_selection=os.environ["BENCH_DET_SELECTION"])
    # trained weights when available: the EM iteration count (and thus the
    # honest throughput) depends on the CNN prior's quality
    weights_fp = wload.weights_identity()
    params, mean = wload.load_params_and_mean(warn=False)
    pipe = Pipeline(params=params, mean=mean, cfg=cfg)

    # realistic inputs: rendered synthetic scenes (for the full path) and
    # their line bundles (for the fused-device breakdown)
    import numpy as np_
    rng = np_.random.default_rng(0)
    imgs_np, ls, lps, masks = [], [], [], []
    for _ in range(batch):
        scene = synth.make_scene(rng, lines_per_vp=int(rng.integers(30, 60)),
                                 outliers=int(rng.integers(10, 30)))
        imgs_np.append(render_scene_image(scene, size=size, rng=rng))
        l, lp, m = pad_lines(scene.segments, cfg.n_pad)
        ls.append(l), lps.append(lp), masks.append(m)
    # ship uint8 over the H2D link (the images' native format; the device
    # detector casts to f32 on chip) — 4x less per-call transfer
    imgs_host = np_.stack(imgs_np).astype(np_.uint8)
    l = jnp.asarray(np_.stack(ls))
    lp = jnp.asarray(np_.stack(lps))
    m = jnp.asarray(np_.stack(masks))

    def readback(out):
        # NB: jax.block_until_ready does not actually block on the axon
        # platform — force a device->host readback so the timing is honest
        return float(jnp.sum(out["hp1"]))

    imgs_dev0 = jnp.asarray(imgs_host)

    from vanishing_points_2017_tpu.ops.lines_device import (
        detect_segments_device)
    from vanishing_points_2017_tpu.ops import lines as lineops
    from vanishing_points_2017_tpu.ops import sphere as sphere_mod
    from vanishing_points_2017_tpu.models import cnn as cnn_mod
    from vanishing_points_2017_tpu.em import expectation_maximisation
    from vanishing_points_2017_tpu.em.horizon import (
        calculate_horizon_and_ortho_vp)

    def detect_stage(ims):
        def one(img):
            lp_d, lm_d = detect_segments_device(
                img, max_segments=cfg.n_pad,
                min_count=cfg.det_min_count,
                min_len_px=cfg.det_min_len_px,
                min_density=cfg.det_min_density,
                selection=cfg.det_selection,
                max_records=cfg.det_max_records,
                topk_impl=cfg.det_topk)
            l_d = jnp.where(lm_d[:, None],
                            lineops.segments_to_homogeneous(lp_d), 0.0)
            return l_d, lp_d, lm_d
        return jax.vmap(one)(ims)

    # CRITICAL: params/mean must be jit ARGUMENTS, never closure
    # captures — closed-over arrays are embedded into the program as
    # constants, and shipping a 1 GB dense-weight program through the
    # axon tunnel is precisely what made every composition "compile"
    # forever (the committed 43 MB factorized weights compile in ~30 s
    # either way, but arguments are correct for any artifact).
    wparams = jax.tree.map(jnp.asarray, pipe.params)
    wmean = pipe.mean

    t0 = time.time()
    if split == "1":
        full = jax.jit(
            lambda im, pp, mm: device_pipeline_full(im, pp, mm, cfg)) \
            .lower(imgs_dev0, wparams, wmean).compile()
        programs = [full]

        def run_e2e(ims):
            return full(ims, wparams, wmean)
    elif split == "2":
        det_prog = jax.jit(detect_stage).lower(imgs_dev0).compile()
        l0, lp0, m0 = det_prog(imgs_dev0)
        post_prog = jax.jit(
            lambda a, b, c, pp, mm: device_pipeline_batch(
                a, b, c, pp, mm, cfg)) \
            .lower(l0, lp0, m0, wparams, wmean).compile()
        programs = [det_prog, post_prog]

        def run_e2e(ims):
            a, b, c = det_prog(ims)
            return post_prog(a, b, c, wparams, wmean)
    else:
        # split == "3": detect / render+CNN / EM+horizon — the smallest
        # programs (each compiles in seconds-to-~1 min even when the
        # axon compile service starves on larger compositions); costs
        # two extra dispatches per batch
        cdtype = jnp.dtype(cfg.cnn_dtype).type

        def render_cnn(l_b, m_b, pp, mm):
            def one(a, b):
                return sphere_mod.sphere_image_uint8(
                    a, b, size=cfg.sphere_size)
            img_u8 = jax.vmap(one)(l_b, m_b)
            x = cnn_mod.preprocess(img_u8, mm)
            pred = cnn_mod.forward(pp, x, compute_dtype=cdtype)
            return img_u8, pred

        def em_horizon(l_b, lp_b, m_b, img_u8, pred):
            def one(a, b, c, im, pr):
                em = expectation_maximisation(
                    a, b, pr, im.astype(jnp.float32), c, cfg.em)
                hp1, hp2, *_ = calculate_horizon_and_ortho_vp(
                    em.vp, em.counts, em.alive, maxbest=cfg.maxbest,
                    theta_vmin=cfg.theta_vmin,
                    pos_gate_ideal_tol=cfg.horizon_pos_gate_tol)
                return {"hp1": hp1, "hp2": hp2}
            return jax.vmap(one)(l_b, lp_b, m_b, img_u8, pred)

        det_prog = jax.jit(detect_stage).lower(imgs_dev0).compile()
        l0, lp0, m0 = det_prog(imgs_dev0)
        rc_prog = jax.jit(render_cnn) \
            .lower(l0, m0, wparams, wmean).compile()
        i0, p0 = rc_prog(l0, m0, wparams, wmean)
        eh_prog = jax.jit(em_horizon) \
            .lower(l0, lp0, m0, i0, p0).compile()
        programs = [det_prog, rc_prog, eh_prog]

        def run_e2e(ims):
            a, b, c = det_prog(ims)
            iu, pr = rc_prog(a, c, wparams, wmean)
            return eh_prog(a, b, c, iu, pr)
    compile_full_s = time.time() - t0
    t0 = time.time()
    readback(run_e2e(imgs_dev0))
    first_exec_s = time.time() - t0  # includes the axon server setup

    # Serialized loop: H2D + compute + readback round-trip per batch
    # (latency semantics — each batch fully completes before the next
    # is dispatched; was the round-1/2 headline).
    t0 = time.time()
    for _ in range(iters):
        readback(run_e2e(jnp.asarray(imgs_host)))  # includes H2D each iter
    dt_serial = time.time() - t0
    serial_ips = batch * iters / dt_serial

    # Pipelined loop: every batch's H2D + compute is dispatched
    # back-to-back and ALL results are read back at the end — standard
    # throughput semantics (transfers overlap compute, exactly what a
    # prefetching data loader does). Still includes every H2D and every
    # result readback; this is the headline. Measured on the axon
    # tunnel (~10-30 MB/s H2D) this is compute-bound where the serial
    # loop is transfer-bound (scripts/profile_e2e.py).
    t0 = time.time()
    outs = [run_e2e(jnp.asarray(imgs_host)) for _ in range(iters)]
    for o in outs:
        readback(o)
    dt_full = time.time() - t0
    e2e_ips = batch * iters / dt_full

    # Compute-only: device-resident inputs, one readback at the end —
    # the number that survives on real (non-tunneled) TPU hosts where
    # PCIe H2D is not the bottleneck.
    t0 = time.time()
    outs = [run_e2e(imgs_dev0) for _ in range(iters)]
    for o in outs:
        readback(o)
    compute_ips = batch * iters / (time.time() - t0)

    # ---- breakdown: fused device program on pre-extracted lines ----
    # (a second big program = a second axon server setup; opt-IN)
    fused_ips = None
    compile_fused_s = None
    if breakdown:
        fused = jax.jit(lambda a, b, c, pp, mm: device_pipeline_batch(
            a, b, c, pp, mm, cfg))
        t0 = time.time()
        readback(fused(l, lp, m, wparams, wmean))
        compile_fused_s = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            readback(fused(l, lp, m, wparams, wmean))
        dt_fused = time.time() - t0
        fused_ips = batch * iters / dt_fused

    # ---- breakdown: host C++ LSD (the alternative detection path) ----
    from vanishing_points_2017_tpu.data import io as dio
    t0 = time.time()
    det = dio.detect_lsd_lines(imgs_np[0].astype(np_.float64))
    lsd_s = time.time() - t0

    # ---- MFU estimate from XLA's own cost analysis (same executables) ----
    mfu = None
    flops_per_img = None
    try:
        flops = 0.0
        for prog in programs:
            cost = prog.cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops += float(cost.get("flops", 0.0))
        if flops > 0:
            flops_per_img = flops / batch
            if platform != "cpu":
                peak = float(os.environ.get("BENCH_PEAK_FLOPS", "197e12"))
                mfu = (flops * iters / dt_full) / peak
    except Exception:
        pass

    device_kind = jax.devices()[0].device_kind
    sys.stderr.write(
        f"bench[{platform}/{split}]: device={device_kind} batch={batch} "
        f"weights={weights_fp} "
        f"iters={iters} size={size} compile_full={compile_full_s:.1f}s "
        f"first_exec={first_exec_s:.1f}s "
        f"e2e={e2e_ips:.2f} img/s (serial={serial_ips:.2f}, "
        f"compute={compute_ips:.2f}) fused={fused_ips} "
        f"lsd_host={lsd_s * 1000:.0f}ms/img "
        f"({det['segments'].shape[0]} segs) "
        f"mfu={mfu if mfu is None else round(mfu, 4)}\n")

    return {
        "metric": "end_to_end_images_per_sec",
        "value": round(e2e_ips, 3),
        "unit": "images/s",
        "vs_baseline": round(e2e_ips / REFERENCE_IMAGES_PER_SEC, 2),
        "baseline_note": ("vs_baseline divides by the DOCUMENTED ESTIMATE "
                          "0.2 img/s (reference cannot run here; "
                          "BASELINE.md)"),
        "degraded": platform == "cpu",
        "breakdown": {
            "includes_detection": True,
            "timing_semantics": "pipelined (all H2D+compute dispatched "
                                "back-to-back, all results read back)",
            "platform": platform,
            "device": device_kind,
            "orchestration": {"1": "fused", "2": "two_program",
                              "3": "three_program"}.get(split, split),
            "image_size": size,
            "batch": batch,
            "det_selection": cfg.det_selection,
            "weights_fingerprint": weights_fp,
            "serial_images_per_sec": round(serial_ips, 3),
            "compute_images_per_sec": round(compute_ips, 3),
            "fused_device_images_per_sec":
                None if fused_ips is None else round(fused_ips, 3),
            "host_lsd_ms_per_image": round(lsd_s * 1000, 1),
            "compile_full_s": round(compile_full_s, 1),
            "first_exec_setup_s": round(first_exec_s, 1),
            "compile_fused_s":
                None if compile_fused_s is None else round(compile_fused_s, 1),
            "flops_per_image": flops_per_img,
            "mfu_estimate": None if mfu is None else round(mfu, 4),
        },
    }


def worker_main(spec_path: str) -> int:
    with open(spec_path) as fh:
        spec = json.load(fh)
    # env overrides (e.g. VP_CCL_IMPL=xla on the fallback
    # rung) take effect here: the detector reads them at trace time
    os.environ.update(spec.get("env", {}))
    rec = measure(spec["platform"], spec["split"], spec["batch"],
                  spec["iters"], spec["size"], spec["breakdown"])
    tmp = spec["outfile"] + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(rec, fh)
    os.replace(tmp, spec["outfile"])
    return 0


# --------------------------------------------------------------------------
# parent: deadline supervisor — never imports jax, always emits the JSON
# --------------------------------------------------------------------------

class _Attempt:
    def __init__(self, name: str, platform: str, split: str, batch: int,
                 iters: int, size: int, breakdown: bool,
                 env: dict | None = None):
        self.name, self.platform, self.split = name, platform, split
        self.batch, self.iters, self.size = batch, iters, size
        self.breakdown = breakdown
        self.env = env or {}
        self.proc: subprocess.Popen | None = None
        self.outfile = ""
        self.deadline_at = 0.0
        self.status = "pending"

    def start(self, slice_s: float, workdir: str) -> None:
        spec = {"platform": self.platform, "split": self.split,
                "batch": self.batch, "iters": self.iters, "size": self.size,
                "breakdown": self.breakdown, "env": self.env,
                "outfile": os.path.join(workdir, f"{self.name}.json")}
        self.outfile = spec["outfile"]
        spec_path = os.path.join(workdir, f"{self.name}.spec.json")
        with open(spec_path, "w") as fh:
            json.dump(spec, fh)
        self.deadline_at = time.time() + slice_s
        cmd = [sys.executable, os.path.abspath(__file__), "--worker",
               spec_path]
        # The CPU fallback runs in parallel from t=0, but this image's host
        # has ONE core: an un-niced CPU worker starves the TPU primary's
        # host side (trace/lowering, tunnel I/O, readbacks) and measured
        # +180s on its wall clock — enough to blow the default slice. The
        # fallback is a guarantee, not a race entrant: give it the lowest
        # scheduler priority so it only consumes what the TPU path leaves.
        # (preexec_fn, not a `nice` binary prefix: the syscall wrapper is
        # what hasattr probes, and a missing /usr/bin/nice would raise in
        # the parent and break its always-emit-JSON contract.)
        preexec = None
        if self.platform == "cpu" and hasattr(os, "nice"):
            preexec = lambda: os.nice(19)  # noqa: E731
        self.proc = subprocess.Popen(
            cmd, stdout=sys.stderr, stderr=sys.stderr, preexec_fn=preexec)
        self.status = "running"
        sys.stderr.write(f"bench: started {self.name} "
                         f"(slice {slice_s:.0f}s)\n")

    def poll(self) -> str:
        """-> running|done|failed|timeout (kills the child on timeout)."""
        if self.status != "running":
            return self.status
        rc = self.proc.poll()
        if rc is None:
            if time.time() > self.deadline_at:
                self.kill()
                self.status = "timeout"
            return self.status
        if rc == 0 and os.path.isfile(self.outfile):
            self.status = "done"
        else:
            self.status = "failed"
        sys.stderr.write(f"bench: {self.name} -> {self.status} (rc={rc})\n")
        return self.status

    def kill(self) -> None:
        if self.proc is not None and self.proc.poll() is None:
            sys.stderr.write(f"bench: killing {self.name} "
                             f"(slice expired)\n")
            self.proc.terminate()
            try:
                self.proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                self.proc.kill()
                self.proc.wait()

    def result(self) -> dict | None:
        if self.status == "done":
            with open(self.outfile) as fh:
                return json.load(fh)
        return None


def _emit(record: dict) -> None:
    print(json.dumps(record))
    sys.stdout.flush()


def _degraded_stub(note: str) -> dict:
    return {
        "metric": "end_to_end_images_per_sec",
        "value": None,
        "unit": "images/s",
        "vs_baseline": None,
        "degraded": True,
        "baseline_note": ("no orchestration landed before the deadline: "
                          + note),
        "breakdown": {"elapsed_s": round(time.time() - _START, 1)},
    }


def parent_main() -> int:
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    size = int(os.environ.get("BENCH_IMAGE_SIZE", "640"))
    breakdown = os.environ.get("BENCH_BREAKDOWN", "0") == "1"
    # Default = the fused single program (the zero-host design thesis):
    # measured round 4 at the final defaults it matches-or-beats the
    # two-program split in the same tunnel window (e2e 67.1 vs 66.1
    # img/s pipelined, compute-bound 168 vs 171, and a FASTER axon
    # first-exec setup 54 s vs 210 s). BENCH_FUSED=0 selects the
    # two-program split; the three-program rung remains the automatic
    # fallback when the compile service starves on large compositions.
    tpu_split = "2" if os.environ.get("BENCH_FUSED", "1") == "0" else "1"

    workdir = tempfile.mkdtemp(prefix="bench_")
    best: dict | None = None
    tpu_result: dict | None = None
    attempts: list[_Attempt] = []  # must exist before the signal handler

    def best_or_stub() -> dict:
        # a banked TPU number always beats the CPU fallback — the signal
        # handler must see it too (the driver's own timeout SIGTERMs the
        # parent while the headline attempt is still running)
        if tpu_result is not None:
            return tpu_result
        return best if best is not None else _degraded_stub(
            "all attempts failed or timed out")

    def on_term(signum, frame):
        sys.stderr.write(f"bench: signal {signum} — emergency emit\n")
        for a in attempts:
            a.kill()
        _emit(best_or_stub())
        os._exit(0)

    signal.signal(signal.SIGTERM, on_term)
    signal.signal(signal.SIGINT, on_term)

    # Reserve wall clock for the final emit + a post-failure fallback.
    RESERVE = 20.0
    cpu_batch = int(os.environ.get("BENCH_CPU_BATCH", "4"))
    cpu_iters = int(os.environ.get("BENCH_CPU_ITERS", "2"))

    # Bank-first ordering (round 4): the three-program rung runs FIRST on
    # a fresh grant (smallest programs -> best odds against the axon
    # platform's 50-600 s per-program first-exec setup variance), then
    # the fused headline attempt gets everything left. TPU attempts are
    # strictly sequential — never two TPU processes at once.
    banker = _Attempt("tpu_banker", "axon", "3", batch, iters, size, False)
    tpu1 = _Attempt("tpu_primary", "axon", tpu_split, batch, iters, size,
                    breakdown)
    # the rescue rung strips the Pallas CCL kernel (VP_CCL_IMPL=xla):
    # it runs only when the banker FAILED outright (not timed out) —
    # covers a Mosaic rejection of the kernel on the real chip
    rescue = _Attempt("tpu_rescue3", "axon", "3", batch, iters, size, False,
                      env={"VP_CCL_IMPL": "xla"})
    cpu = _Attempt("cpu_fallback", "cpu", "2", cpu_batch, cpu_iters, size,
                   False)
    attempts.extend([banker, tpu1, rescue, cpu])

    # CPU fallback runs in parallel from t=0 (it never touches the TPU, so
    # it cannot interfere with the grant); it banks a guaranteed number.
    if os.environ.get("BENCH_CPU_FALLBACK", "1") == "1":
        cpu.start(min(_remaining() - RESERVE, 600.0), workdir)
    else:
        cpu.status = "skipped"

    t1_cap = float(os.environ.get("BENCH_T1_SLICE", "inf"))
    if os.environ.get("BENCH_BANKER", "1") == "1":
        # the banker may run to the deadline: in a slow window its
        # in-flight server setup is still the likeliest path to ANY TPU
        # number (killing it would wedge the grant 3-5 min for whoever
        # runs next)
        banker.start(max(60.0, _remaining() - RESERVE - 10.0), workdir)
    else:
        banker.status = "skipped"
        rescue.status = "skipped"  # rescue exists only for banker failure
        tpu1.start(max(60.0, min(_remaining() - RESERVE, t1_cap)), workdir)

    while _remaining() > RESERVE:
        bs = banker.poll()
        if bs == "done" and tpu_result is None:
            tpu_result = banker.result()
            sys.stderr.write("bench: TPU number banked "
                             f"({tpu_result['value']} img/s, three-program)\n")
        if bs == "done" and tpu1.status == "pending":
            tpu1.start(max(60.0, min(_remaining() - RESERVE, t1_cap)),
                       workdir)
        if bs == "done" and rescue.status == "pending":
            rescue.status = "skipped"  # banker landed — rescue not needed
        if bs == "failed" and rescue.status == "pending":
            # fast failure (not a timeout): likely a kernel/compile error,
            # so retry the same rung with the Pallas CCL stripped; the
            # fused program contains the same kernel, so skip it
            if tpu1.status == "pending":
                tpu1.status = "skipped"
            if _remaining() > RESERVE + 90.0:
                rescue.start(_remaining() - RESERVE - 10.0, workdir)
            else:
                rescue.status = "skipped"
        if bs == "timeout":
            # window too slow even for the smallest programs — the big
            # program has no chance, and the rescue rung would start on
            # a grant wedged by the banker's kill
            if tpu1.status == "pending":
                tpu1.status = "skipped"
            if rescue.status == "pending":
                rescue.status = "skipped"

        s1 = tpu1.poll()
        if s1 == "done":
            tpu_result = tpu1.result()
            break
        rs = rescue.poll()
        if rs == "done" and tpu_result is None:
            tpu_result = rescue.result()
            break
        cs = cpu.poll()
        if cs == "done" and best is None:
            best = cpu.result()
            sys.stderr.write("bench: CPU fallback number banked "
                             f"({best['value']} img/s)\n")
        if not any(a.status in ("running", "pending") for a in attempts):
            break  # nothing left to wait for
        if tpu_result is not None \
                and not any(a.status == "running" for a in (tpu1, rescue)) \
                and tpu1.status != "pending":
            break  # banked number is final — no better attempt in flight
        time.sleep(2.0)

    for a in attempts:
        a.kill()
    if tpu_result is not None:
        best = tpu_result
    elif best is None and cpu.poll() == "done":
        best = cpu.result()
    _emit(best_or_stub())
    return 0


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        raise SystemExit(worker_main(sys.argv[2]))
    raise SystemExit(parent_main())
