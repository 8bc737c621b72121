"""Benchmark: 720p frames/sec through the flagship SPEINet forward on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
Baseline (BASELINE.md): the reference averages ~1.21 s forward per 720p
frame on an A100-class GPU => 0.826 frames/sec.

Both engine modes are measured in one run and recorded side by side in
`detail` (VERDICT r2 #9: a workload change must never masquerade as a
kernel speedup across rounds):
- video:  steady-state sliding-window throughput through the cached-pyramid
          engine (infer --cache_pyramids) — the video task the baseline's
          per-window forward_time measures.
- direct: the plain full forward (all 7 encoder legs per window).
The headline `value` is the video mode. Set BENCH_MODE=direct|video to run
only one (BENCH_ITERS, BENCH_BATCH, BENCH_DTYPE knobs as before).

Timing methodology: iterations are CHAINED (each forward's output is mixed
into the next input) and the loop ends with a host readback. The remote
TPU relay used in this environment evaluates lazily — block_until_ready
can return before the computation runs, and duplicate independent calls
can be elided — so only a data-dependent chain ending in a readback
measures real sustained throughput.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_FPS = 1.0 / 1.21  # results/GoProRs/SPEINet/speinet_0.5 forward_time

# A warm run still writes a handful of tiny glue-op entries (jit_concatenate,
# jit_slice, ...) to the persistent cache, so "any new file" mislabels warm
# runs as cold; only a new LARGE entry means one of the real model programs
# actually compiled.
_COLD_ENTRY_BYTES = 1 << 20


def _aot_ver(batch: int, h: int, w: int) -> str:
    """AOT-cache key shared by the video and direct modes: package code
    hash + a hash of THIS file (bench.py wrappers are part of the traced
    program) + compile-relevant env (XLA_FLAGS) + every kernel-selection
    env knob the traced program dispatches on (ADVICE r3: the direct tag
    omitted the knobs; code_version() omitted bench.py and XLA_FLAGS)."""
    import hashlib

    from speinet_tpu.utils.aot_cache import code_version

    knobs = ",".join(f"{k}={os.environ.get(k, '')}" for k in
                     ("SPEINET_CONV_TR", "SPEINET_CONV_KCAT",
                      "SPEINET_SWIN_G", "SPEINET_SWIN_S",
                      "SPEINET_SWIN_R", "SPEINET_SWIN_FUSEBLOCK",
                      "SPEINET_SWIN_COMPACT", "SPEINET_SWIN_GW",
                      "SPEINET_SWIN_QH", "SPEINET_MLP_TL",
                      "SPEINET_NO_FUSED", "BENCH_SHARP_RATIO",
                      "SPEINET_CORR_RAW", "SPEINET_CORR_TL",
                      "SPEINET_CORR_TK", "SPEINET_CORR_SCALED",
                      "SPEINET_GF_SEG9", "SPEINET_FASTCONV_MB",
                      "SPEINET_CONVT_SUBPIXEL"))
    h_self = hashlib.sha256()
    with open(os.path.abspath(__file__), "rb") as f:
        h_self.update(f.read())
    h_self.update(os.environ.get("XLA_FLAGS", "").encode())
    return (f"{code_version()}-{h_self.hexdigest()[:10]}"
            f"-{batch}x{h}x{w}-{knobs}")


def _cache_files(cache_dir):
    if not (cache_dir and os.path.isdir(cache_dir)):
        return set()
    out = set()
    for f in os.listdir(cache_dir):
        try:   # concurrent eviction/rename of tmp entries is fine to skip
            if os.path.getsize(os.path.join(cache_dir, f)) >= _COLD_ENTRY_BYTES:
                out.add(f)
        except OSError:
            pass
    return out


def _timed_chain(chunk, prev0, n_iter):
    """Compile (first call) then time n_iter chained calls ending in a
    readback. Returns (sec_per_iter, compile_sec, cache_state)."""
    import jax

    cache_dir = jax.config.jax_compilation_cache_dir
    before = _cache_files(cache_dir)
    t0 = time.time()
    out = chunk(prev0)
    _ = float(out.sum())
    compile_time = time.time() - t0
    cache_state = "cold" if _cache_files(cache_dir) - before else "warm"

    t0 = time.time()
    prev = out
    for _ in range(n_iter):
        prev = chunk(prev)
    _ = float(prev.sum())
    return (time.time() - t0) / n_iter, compile_time, cache_state


def _run_video_mode(model, variables, frames, batch, h, w, n_iter,
                    ratio=None):
    """Steady-state sliding-window video throughput through the cached
    engine (infer.py --cache_pyramids): per chunk of `batch` consecutive
    windows, the device work is 3 encoder legs per NEW frame (enc, enc(RL1),
    enc(RL5)), sharp-anchor pyramids at the GoProRS-0.5 cadence (~one new
    anchor per 2 frames, results/GoProRs/SPEINet/speinet_0.5), and one
    batched fusion+transfer+decode restore — the same per-frame device
    sequence the engine issues, identical numerics to the direct forward
    (tests/test_infer_equivalence.py::test_cached_pyramid_engine_matches_direct).
    The reference's 1.21 s/frame baseline measures this same workload
    (per-window forward_time in a stride-1 video loop)."""
    import jax
    import jax.numpy as jnp
    from speinet_tpu.models.speinet import SPEINet

    if ratio is None:
        ratio = float(os.environ.get("BENCH_SHARP_RATIO", "0.5"))
    # anchor cadence: at ratio r, a new sharp anchor appears every 1/r
    # frames. Within a chunk that is n_anchor = batch*r anchors (>= 1);
    # below 1/batch, the anchor program instead runs only every
    # `anchor_every` chunks (GoProRS spans r = 0.02..0.5, BASELINE.md —
    # VERDICT r3 #7 asks for the fleet-relevant cadence sweep).
    n_anchor = max(1, round(batch * ratio))
    anchor_every = max(1, round(1.0 / (batch * ratio)))

    # weights as traced args, not closure constants — closed-over params
    # (~110 MB) embed into each serialized module and, together with the
    # packed swin masks, overflowed the remote-compile relay's request limit
    def legs(v, base_fr, prev):
        # the chain mix-in runs INSIDE the jitted program: an un-jitted
        # `base + prev*1e-4` is its own relay dispatch over an 88 MB f32
        # tensor per chunk
        return model.apply(v, base_fr + prev * 1e-4,
                           method=SPEINet.encode_window_legs)

    def anchor(v, anchor_fr, prev):
        return model.apply(v, anchor_fr + prev[: anchor_fr.shape[0]] * 1e-4,
                           method=SPEINet.anchor_pyramid)

    def restore(v, m, n, p1, p2, p3, hs):
        # routing='sharp': this chunk's has_sharp is all-True and the engine
        # dispatches the host-known specialization in that case
        # (infer.py _infer_video_cached; output-identical to 'mixed').
        # The neighbor roll and the anchor->batch tiling also live inside
        # the program (they were 3 more un-jitted 100-200 MB dispatches).
        n1 = jnp.roll(n, 1, axis=0)
        na = p1.shape[0]
        rep = lambda a: jnp.concatenate([a] * ((batch + na - 1) // na))[:batch]
        return model.apply(v, m, (n, n1), rep(p1), rep(p2), rep(p3), hs,
                           routing="sharp",
                           method=SPEINet.restore_from_features)

    base = np.stack([frames[i % len(frames)] for i in range(batch)])
    base = jnp.asarray(np.broadcast_to(base[:, None], (batch, 3, h, w)).copy())
    anchor_in = base[:n_anchor]
    hs = jnp.ones((batch,), bool)

    aot_dir = os.environ.get("SPEINET_AOT_CACHE_DIR", os.path.join(
        os.path.expanduser("~"), ".cache", "speinet_aot"))
    aot_before = set(os.listdir(aot_dir)) if os.path.isdir(aot_dir) else set()
    precompile_t0 = time.time()
    if os.environ.get("BENCH_AOT", "1") == "1":
        # disk-serialized executables sidestep the per-process compile-cache
        # key miss on this relay (utils/aot_cache.py); fail-open — any
        # serialize/deserialize error just recompiles via plain jit
        from speinet_tpu.utils.aot_cache import aot_cached

        ver = _aot_ver(batch, h, w)
        prev0 = jax.ShapeDtypeStruct((batch, 3, h, w), jnp.float32)
        _jl = aot_cached(legs, (variables, base, prev0),
                         tag=f"bench-legs-{ver}")
        _ja = aot_cached(anchor, (variables, anchor_in, prev0),
                         tag=f"bench-anchor-{ver}-na{n_anchor}")
        ex_m, ex_n = jax.eval_shape(legs, variables, base, prev0)
        ex_p = jax.eval_shape(anchor, variables, anchor_in, prev0)
        _jr = aot_cached(restore,
                         (variables, ex_m, ex_n, ex_p[0], ex_p[1], ex_p[2],
                          jax.ShapeDtypeStruct((batch,), jnp.bool_)),
                         tag=f"bench-restore-{ver}")
    else:
        _jl, _ja, _jr = jax.jit(legs), jax.jit(anchor), jax.jit(restore)
    precompile_sec = time.time() - precompile_t0   # aot path compiles here
    jl = lambda *a: _jl(variables, *a)
    ja = lambda *a: _ja(variables, *a)
    jr = lambda *a: _jr(variables, *a)

    pcell = [None]
    it = [0]

    def chunk(prev):
        # chain: fold the previous output into the new frames so the lazy
        # relay cannot elide or reorder any call
        m, n = jl(base, prev)
        if pcell[0] is None or it[0] % anchor_every == 0:
            pcell[0] = ja(anchor_in, prev)
        it[0] += 1
        p1, p2, p3 = pcell[0]
        out = jr(m, n, p1, p2, p3, hs)
        return out

    if os.environ.get("BENCH_DEBUG_PHASES"):
        # phase-time the first calls with bench's own spellings (so the
        # persistent-cache keys are exactly the measured programs')
        import jax as _jax
        prev_dbg = jnp.zeros((batch, 3, h, w), jnp.float32)
        t = time.time()
        m, n = jl(base, prev_dbg)
        _jax.block_until_ready((m, n))
        print(f"# legs first: {time.time()-t:.1f}s", file=sys.stderr)
        t = time.time()
        ps = ja(anchor_in, prev_dbg)
        _jax.block_until_ready(ps)
        print(f"# anchor first: {time.time()-t:.1f}s", file=sys.stderr)
        t = time.time()
        out = jr(m, n, ps[0], ps[1], ps[2], hs)
        _jax.block_until_ready(out)
        print(f"# restore first: {time.time()-t:.1f}s", file=sys.stderr)

    # low cadences run the anchor every `anchor_every` chunks; time whole
    # cadence periods (counter phase-aligned by the warmup call at it=0)
    n_timed = n_iter if anchor_every == 1 else 2 * anchor_every
    dt, compile_time, cache_state = _timed_chain(
        chunk, jnp.zeros((batch, 3, h, w), jnp.float32), n_timed)
    # truthful label (VERDICT r4 #3): the AOT precompile path compiles
    # WITHOUT touching jax's persistent compile-cache dir, so a run that
    # wrote new serialized executables must report cold even when
    # _timed_chain saw no new >1MB jax-cache entries
    aot_after = set(os.listdir(aot_dir)) if os.path.isdir(aot_dir) else set()
    if aot_after - aot_before:
        cache_state = "cold"
    return {"fps": round(batch / dt, 4),
            "sec_per_frame": round(dt / batch, 4),
            "compile_sec": round(compile_time + precompile_sec, 1),
            "compile_cache": cache_state}


def _run_direct_mode(model, variables, frames, batch, h, w, n_iter):
    """Plain full forward: all 7 encoder legs + fusion + transfer + decode
    per window (the reference's single-window inference program)."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(np.broadcast_to(frames[None, :, None],
                                    (batch, 5, 3, h, w)).copy())

    def step(v, inp, prev):
        inp = inp.at[:, 1].add(prev * 1e-4)
        return model.apply(v, inp, train=False)

    # no AOT here: measured 48.5 s to deserialize+load the single 110 MB
    # direct executable vs 36.9 s to compile it — the executable upload
    # over the relay dominates for this one-big-program case, while the
    # three smaller video-mode programs win big (71.4 -> 13.5 s)
    if os.environ.get("BENCH_AOT_DIRECT", "0") == "1":
        from speinet_tpu.utils.aot_cache import aot_cached

        prev0 = jax.ShapeDtypeStruct((batch, 3, h, w), jnp.float32)
        _fwd = aot_cached(step, (variables, x, prev0),
                          tag=f"bench-direct-{_aot_ver(batch, h, w)}")
    else:
        _fwd = jax.jit(step)
    fwd = lambda prev: _fwd(variables, x, prev)
    dt, compile_time, cache_state = _timed_chain(
        fwd, jnp.zeros((batch, 3, h, w), jnp.float32), n_iter)
    return {"fps": round(batch / dt, 4),
            "sec_per_frame": round(dt / batch, 4),
            "compile_sec": round(compile_time, 1),
            "compile_cache": cache_state}


def _run_train_mode(batch: int, n_steps: int, accum: int):
    """Training throughput at the flagship template (patch 200^2): steps/s
    and training frames/s on one chip (VERDICT r3 #5 — track training perf
    per round like inference). `accum` > 1 runs gradient accumulation with
    batch/accum microbatches (the documented way to reach the reference's
    batch 20 within 16 GB HBM; optimizer math matches the mean-loss batch
    gradient; train-mode BN sees microbatch stats)."""
    import jax
    import jax.numpy as jnp

    from speinet_tpu.config import Config, set_template
    from speinet_tpu.models.speinet import SPEINet
    from speinet_tpu.training.train_state import (create_train_state,
                                                  make_train_step)
    from speinet_tpu.utils.init_cache import cached_init

    patch = int(os.environ.get("BENCH_TRAIN_PATCH", "200"))
    cfg = set_template(Config(template="SPEINet")).replace(
        batch_size=batch, patch_size=patch)
    model = SPEINet.from_config(cfg)
    rng = np.random.default_rng(1)
    micro = batch // accum
    x = jnp.asarray(np.clip(
        0.5 + 0.1 * rng.standard_normal((batch, 5, 3, patch, patch)), 0.02,
        1.0).astype(np.float32))
    gt = x[:, 2]

    variables = cached_init(model, jax.random.PRNGKey(0),
                            jnp.zeros((1, 5, 3, 80, 80), jnp.float32))
    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 5, 3, 80, 80), jnp.float32))
    state = state.replace(params=variables["params"],
                          batch_stats=variables.get("batch_stats", {}))
    if accum > 1:
        # true gradient accumulation: optax.MultiSteps buffers microbatch
        # grads and applies ONE Adam update every `accum` micro steps —
        # the logical step trains the reference's batch on 16 GB HBM
        import optax

        tx = optax.MultiSteps(tx, every_k_schedule=accum)
        state = state.replace(opt_state=tx.init(state.params))
    step = make_train_step(cfg, model, tx, mesh=None)

    def logical_step(state, seed):
        total = None
        for k in range(accum):
            mb = slice(k * micro, (k + 1) * micro)
            state, total, _ = step(state, x[mb], gt[mb],
                                   jax.random.PRNGKey(seed * accum + k))
        return state, total

    t0 = time.time()
    state, total = logical_step(state, 0)
    float(total)                           # compile + run 1
    compile_sec = time.time() - t0
    t1 = time.time()
    for i in range(1, n_steps + 1):
        state, total = logical_step(state, i)
    float(total)
    dt = (time.time() - t1) / n_steps
    return {"train_ms_per_step": round(dt * 1000, 1),
            "train_fps": round(batch / dt, 3),
            "train_batch": batch, "train_patch": patch,
            "train_accum": accum,
            "train_compile_sec": round(compile_sec, 1)}


def main():
    import jax
    import jax.numpy as jnp

    from speinet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from speinet_tpu.config import Config, set_template
    from speinet_tpu.models.speinet import SPEINet

    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    mode = os.environ.get("BENCH_MODE", "both")
    cfg = set_template(Config(template="SPEINet")).replace(compute_dtype=dtype)
    model = SPEINet.from_config(cfg)

    h, w = 720, 1280
    x_small = jnp.zeros((1, 5, 3, 80, 80), jnp.float32)
    # disk value-cache: model.init costs ~2-10 min of pure compile overhead
    # per process (utils/init_cache.py); warm starts load the ~110 MB tree
    from speinet_tpu.utils.init_cache import cached_init
    variables = cached_init(model, jax.random.PRNGKey(0), x_small)

    rng = np.random.default_rng(0)
    # batch 8 measured faster than 4 (2.816 vs 2.735 fps/chip, video mode,
    # warm cache, one v5e chip) and its programs are cache-warmed
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    n_iter = int(os.environ.get("BENCH_ITERS", "5"))
    yy, xx = np.mgrid[0:h, 0:w]
    base = (0.5 + 0.3 * np.sin(xx / 11.0) * np.cos(yy / 13.0)).astype(np.float32)
    frames = np.stack([np.clip(base + 0.02 * rng.standard_normal((h, w)) + 0.01 * t, 0.02, 1.0)
                       for t in range(5)])

    detail = {"batch": batch, "dtype": dtype, "timing": "chained+readback",
              "mode": "video(cached-pyramids, sharp_ratio=0.5)"}
    video = direct = None
    if mode in ("video", "both"):
        video = _run_video_mode(model, variables, frames, batch, h, w, n_iter)
        detail["video_fps"] = video["fps"]
        detail.update({k: video[k] for k in
                       ("sec_per_frame", "compile_sec", "compile_cache")})
        if os.environ.get("BENCH_CADENCE", "1") == "1":
            # anchor-cadence sensitivity across the GoProRS ratio grid
            # (VERDICT r3 #7); headline stays at the 0.5 cadence
            for r in (0.1, 0.02):
                v = _run_video_mode(model, variables, frames, batch, h, w,
                                    n_iter, ratio=r)
                detail[f"video_fps_ratio{r}"] = v["fps"]
            # fleet-average over the GoProRS cadence grid (VERDICT r4 #9:
            # the headline must not be cadence-flattered) — equal-weight
            # mean of the 0.5 / 0.1 / 0.02 sharp-ratio runs
            detail["video_fps_cadence_avg"] = round(float(np.mean(
                [video["fps"], detail["video_fps_ratio0.1"],
                 detail["video_fps_ratio0.02"]])), 4)
    if mode in ("direct", "both"):
        direct = _run_direct_mode(model, variables, frames, batch, h, w, n_iter)
        detail["direct_fps"] = direct["fps"]
        detail["direct_compile_sec"] = direct["compile_sec"]
        detail["direct_compile_cache"] = direct["compile_cache"]
    if os.environ.get("BENCH_TRAIN", "1") == "1":
        try:
            detail.update(_run_train_mode(
                batch=int(os.environ.get("BENCH_TRAIN_BATCH", "20")),
                n_steps=int(os.environ.get("BENCH_TRAIN_STEPS", "6")),
                accum=int(os.environ.get("BENCH_TRAIN_ACCUM", "5"))))
        except Exception as e:   # training bench must never kill the headline
            detail["train_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    head = video if video is not None else direct
    if video is None:
        detail["mode"] = "direct(full forward)"
        detail.update({k: direct[k] for k in
                       ("sec_per_frame", "compile_sec", "compile_cache")})

    fps = head["fps"]
    print(json.dumps({
        "metric": "720p_frames_per_sec",
        "value": fps,
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
