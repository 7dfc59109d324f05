"""Headline benchmark: images/sec/chip for 50-step 512x512 4-instance
InstanceDiffusion generation (PLMS + CFG 7.5, boxes+points conditioning) on
one TPU chip — the BASELINE.json north-star configuration (target: >= 2
img/s/chip on v5e).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N/2.0}

Weights are random-init (no pretrained assets in this environment); compute
cost is identical to the trained model.
"""

import json
import os
import sys
import time

import numpy as np

CHILD_FLAG = "--child"


def _emit(obj: dict) -> None:
    """Stream a result snapshot to the parent orchestrator. In child mode
    stdout is the parent's pipe; each snapshot supersedes the previous one,
    so the parent always holds the newest complete result even if the
    driver's timeout kills us mid-extra."""
    print("@RESULT " + json.dumps(obj), flush=True)


def _device_sanity(timeouts=(660, 300, 300)):
    """Fail fast (with a diagnosis) if the device link is dead instead of
    hanging until an external kill. Observed 2026-08-17: the axon tunnel
    went down mid-session and even a (256,256) matmul blocked forever.

    Round-3 postmortem (BENCH_r03.json rc=134): the probe ran in a daemon
    *thread*; when the main thread called sys.exit(3) while the thread was
    blocked inside JAX C++, libstdc++ raised "FATAL: exception not
    rethrown" -> SIGABRT and no JSON line was emitted. The probe now runs
    in a *subprocess* (killable without touching this process's C++
    state), retries so a transient tunnel flap doesn't kill the round,
    and on final failure prints a parseable JSON error line and exits 3
    cleanly.

    Round-4 measurement: the first device op of a NEW client session takes
    ~5.5 min (339 s timed; device-side session spin-up), then ~25 s while
    warm. A 60 s-timeout retry loop is therefore SELF-DEFEATING cold —
    killing the probe discards the spin-up progress and the next attempt
    starts over. Hence one LONG first attempt and two generous retries,
    instead of six 60 s kills. Round-5 re-measurement widened the cold
    band to 454-584 s (docs/PERF.md), so the first attempt is 11 min and
    the retries 5 min (a killed-and-restarted probe may still land cold)."""
    import subprocess

    probe_src = (
        # ppid watchdog: never outlive the process that spawned us — an
        # orphaned probe blocked in JAX C++ wedges later tunnel connections
        "import os, threading, time\n"
        "_p = os.getppid()\n"
        "def _w():\n"
        "    while True:\n"
        "        time.sleep(5)\n"
        "        if os.getppid() != _p:\n"
        "            os._exit(4)\n"
        "threading.Thread(target=_w, daemon=True).start()\n"
        "import jax, jax.numpy as jnp\n"
        "print(float(jax.jit(lambda a: a.sum())(jnp.ones((8, 8)))))\n"
    )
    # Never leak the child (observed 2026-08-19: the tunnel serializes
    # clients, and an orphaned probe blocked inside JAX C++ wedged every
    # later connection) — Popen + finally-kill survives the parent being
    # SIGTERMed mid-probe, where subprocess.run(timeout=...) would orphan.
    attempts = len(timeouts)
    for i, timeout_s in enumerate(timeouts):
        child = None
        try:
            child = subprocess.Popen(
                [sys.executable, "-c", probe_src],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
            out, err = child.communicate(timeout=timeout_s)
            if child.returncode == 0 and "64.0" in out:
                if i:
                    print(f"bench: device probe ok on attempt {i + 1}",
                          file=sys.stderr, flush=True)
                return
            reason = f"probe rc={child.returncode}: {err.strip()[-200:]}"
        except subprocess.TimeoutExpired:
            reason = (f"probe hung >{timeout_s}s (axon tunnel down? "
                      f"cold session spin-up is ~5.5 min)")
        finally:
            if child is not None and child.poll() is None:
                child.kill()
                child.wait()
        print(f"bench: attempt {i + 1}/{attempts} failed — {reason}",
              file=sys.stderr, flush=True)
        if i + 1 < attempts:
            time.sleep(30)
    _emit({
        "metric": "images_per_sec_per_chip_50step_512px_4inst",
        "value": None, "unit": "img/s/chip", "vs_baseline": None,
        "error": f"device unreachable after {attempts} probe attempts",
    })
    sys.exit(3)


def _child_main():
    bench_start = time.time()

    # Orphan watchdog: if the parent orchestrator dies without cleaning up
    # (SIGKILL), exit rather than keep holding the device session — an
    # orphaned client blocked in JAX C++ wedges every later tunnel
    # connection (observed 2026-08-19). A daemon thread still runs while
    # the main thread blocks in C++ (the GIL is released there).
    import threading

    parent = os.getppid()

    def _watch():
        while True:
            time.sleep(10)
            if os.getppid() != parent:
                os._exit(4)

    if parent != 1:
        threading.Thread(target=_watch, daemon=True).start()

    # SIGTERM -> SystemExit so finally blocks run (e.g. _device_sanity's
    # probe-kill). If the main thread is wedged in JAX C++ the handler is
    # deferred; the parent escalates to SIGKILL after 15 s.
    import signal

    signal.signal(signal.SIGTERM, lambda *_: sys.exit(143))

    _device_sanity()
    # asset-free environment: opt into the hash-fallback tokenizer when
    # the real BPE files are absent (compute cost is identical; flagship
    # paths refuse the fallback without this explicit opt-in)
    from instancediffusion_tpu.data.tokenizer import ASSETS_DIR
    if not os.path.exists(os.path.join(ASSETS_DIR, "vocab.json")) and not (
        os.environ.get("CLIP_TOKENIZER_DIR")
    ):
        os.environ.setdefault("IDTPU_ALLOW_HASH_TOKENIZER", "1")
        print("bench: CLIP BPE assets absent — hash-fallback tokenizer "
              "(run tools/fetch_clip_bpe.py on a networked host)",
              file=sys.stderr, flush=True)
    import jax

    from instancediffusion_tpu.config import Config, apply_test_preset
    from instancediffusion_tpu.pipeline import InstanceDiffusionPipeline

    num_images = int(os.environ.get("BENCH_BATCH", "8"))
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    # BENCH_SAMPLER=dpm measures the DPM-Solver++(2M) few-step serving
    # path (use BENCH_STEPS=20); BENCH_MIS=0.36 measures multi-instance
    # sampling at the reference's flagship eval setting
    # (/root/reference/eval_local.py:79). The headline metric stays the
    # reference protocol (50-step PLMS, mis=0) — the metric name is
    # suffixed so the variants are never conflated.
    sampler = os.environ.get("BENCH_SAMPLER", "plms")
    mis = float(os.environ.get("BENCH_MIS", "0.0"))

    cfg = apply_test_preset(Config(), "box")
    pipe = InstanceDiffusionPipeline.random_init(cfg, seed=0)

    # persistent-cache accounting (the pipeline ctor enabled the cache):
    # a warm run adds no entries and compiles in seconds, not minutes
    cache_dir = os.environ.get(
        "IDTPU_COMPILE_CACHE", os.path.expanduser("~/.cache/idtpu_xla")
    )
    def _cache_entries():
        try:
            return len(os.listdir(cache_dir))
        except OSError:
            return 0
    entries_before = _cache_entries()

    # 4-instance box+point meta (demo_cat_dog_robin.json shape)
    meta = {
        "prompt": "a cat and a dog and a robin sitting on a wooden bench in a park",
        "phrases": ["a cat", "a dog", "a robin", "a wooden bench"],
        "locations": [
            [0.05, 0.35, 0.45, 0.90],
            [0.55, 0.30, 0.95, 0.90],
            [0.42, 0.05, 0.58, 0.25],
            [0.02, 0.55, 0.98, 0.98],
        ],
        "points": [[0.25, 0.62], [0.75, 0.60], [0.50, 0.15], [0.50, 0.76]],
        "alpha_type": [0.75, 0.0, 0.25],
    }

    # warm-up: compile. One retry on a transient tunnel flake — observed
    # 2026-08-20: a healthy session's remote_compile RPC died with
    # "response body closed before all bytes were read"; the next attempt
    # in the same process succeeded. A single flake must not null the
    # round's headline.
    print(f"bench: compiling (B={num_images}, steps={steps})...",
          file=sys.stderr, flush=True)
    for attempt in (1, 2):
        t0 = time.time()
        try:
            imgs = pipe.generate(meta, num_images=num_images, steps=steps,
                                 mis=mis, seed=0, sampler=sampler)
            break
        except Exception as e:  # noqa: BLE001 — jax runtime/tunnel errors
            if attempt == 2:
                raise
            print(f"bench: warm-up attempt 1 failed "
                  f"({type(e).__name__}: {str(e)[:150]}); retrying in 30s",
                  file=sys.stderr, flush=True)
            time.sleep(30)
    compile_s = time.time() - t0
    print(f"bench: compiled+ran in {compile_s:.0f}s", file=sys.stderr, flush=True)
    assert imgs.shape == (num_images, 512, 512, 3), imgs.shape

    # timed runs — PIPELINED steady-state throughput (VERDICT r4 #1) at
    # dispatch depth 1: batch N+1's program is enqueued BEFORE batch N's
    # images are fetched (generate(block=False) never blocks on a device
    # read — pooled phrase embeddings are scattered into the grounding
    # INSIDE the jitted program), so host prep and the uint8 image fetch
    # hide behind device compute. One untimed prime batch fills the
    # pipeline; the timed window is fetch(prime) -> fetch(run n), i.e.
    # exactly n back-to-back device programs. Depth MUST stay at 1:
    # dispatching every program up-front detaches fetch timing from
    # compute — the prime fetch RPC queues behind all the dispatch RPCs on
    # the serialized tunnel, t0 starts late, and the "throughput" exceeds
    # the physics ceiling (measured 2026-08-20: BENCH_RUNS=8 all-up-front
    # read 2.35 img/s vs the 1.03 roofline — an invalid window, not a fast
    # chip). The reference serializes prep -> sample -> fetch per batch
    # (inference.py:94-96); depth-1 overlap is a beat-the-reference lever,
    # not a protocol change: every counted image is fully generated AND
    # fetched to host numpy inside the window.
    n_runs = int(os.environ.get("BENCH_RUNS", "3"))
    prime = pipe.generate(meta, num_images=num_images, steps=steps, mis=mis,
                          seed=1000, sampler=sampler, block=False)
    pending = pipe.generate(meta, num_images=num_images, steps=steps,
                            mis=mis, seed=1, sampler=sampler, block=False)
    prime.fetch()
    t0 = time.time()
    prev = t0
    for i in range(n_runs):
        h, pending = pending, None
        if i + 1 < n_runs:
            pending = pipe.generate(meta, num_images=num_images, steps=steps,
                                    mis=mis, seed=i + 2, sampler=sampler,
                                    block=False)
        imgs = h.fetch()
        now = time.time()
        print(f"bench: run {i + 1}/{n_runs} done, interval "
              f"{now - prev:.2f}s, cumulative "
              f"{num_images * (i + 1) / (now - t0):.4f} img/s",
              file=sys.stderr, flush=True)
        prev = now
    dt = time.time() - t0
    assert imgs.shape == (num_images, 512, 512, 3), imgs.shape
    imgs_per_sec = num_images * n_runs / dt
    # physics sanity: the flagship protocol cannot exceed its roofline
    # ceiling; a higher reading means the timed window lost compute time
    # (see the depth note above), not a fast chip — say so in the JSON.
    window_suspect = (
        sampler == "plms" and steps == 50 and mis == 0.0
        and imgs_per_sec > 1.03
    )
    if window_suspect:
        print(f"bench: WARNING {imgs_per_sec:.3f} img/s exceeds the 1.03 "
              "roofline ceiling — measurement window invalid",
              file=sys.stderr, flush=True)

    # --- extras: driver-verified MIS + train-step numbers (VERDICT r4 #3) --
    # Each is budget-bounded and failure-isolated: the headline result is
    # emitted BEFORE any extra starts (the parent holds the newest snapshot),
    # so a driver timeout mid-extra can never lose the headline. Gates are
    # sized from measured costs (r5 hardware run: mis extra ~300 s, train
    # extra ~1250 s — the full-config fwd+bwd+Adam compile alone is ~1200 s).
    extras: dict = {}
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "3200"))
    skip_extras = os.environ.get("BENCH_SKIP_EXTRAS") == "1"

    def _budget_left():
        return budget_s - (time.time() - bench_start)

    metric = "images_per_sec_per_chip_50step_512px_4inst"
    if sampler != "plms" or steps != 50 or mis != 0.0:
        metric = f"images_per_sec_per_chip_{steps}step_{sampler}_512px_4inst"
        if mis != 0.0:
            metric += f"_mis{mis:g}"

    def _result():
        return {
            "metric": metric,
            "value": round(imgs_per_sec, 4),
            "unit": "img/s/chip",
            "vs_baseline": round(imgs_per_sec / 2.0, 4),
            "extra": {
                "batch": num_images,
                "steps": steps,
                "mis": mis,
                "sec_per_image": round(dt / (num_images * n_runs), 4),
                "compile_s": round(compile_s, 1),
                "cache_entries_before": entries_before,
                "cache_entries_added": _cache_entries() - entries_before,
                "cache_warm": (_cache_entries() == entries_before
                               and entries_before > 0),
                # analytic physics ceiling at reference semantics (50 PLMS
                # steps x CFG, bf16, one v5e): tools/roofline.py + measured
                # sampler/VAE overhead — docs/PERF.md round-3 table. The 2.0
                # north star needs 2x fewer UNet evals (distillation), not
                # better kernels; revised target 1.0.
                "roofline_ceiling_img_s": 1.03,
                "vs_roofline_ceiling": round(imgs_per_sec / 1.03, 4),
                "device": str(jax.devices()[0]),
                **({"window_invalid_exceeds_roofline": True}
                   if window_suspect else {}),
                **extras,
            },
        }

    _emit(_result())

    if not skip_extras and mis == 0.0 and sampler == "plms":
        # MIS at the reference's flagship eval setting (eval_local.py:79:
        # test_mask uses mis=0.36): 1+4 trajectories for the first 18 of 50
        # steps. Separate compiled program -> one compile run, one timed run.
        if _budget_left() > 350:
            try:
                t0 = time.time()
                pipe.generate(meta, num_images=num_images, steps=steps,
                              mis=0.36, seed=0, sampler=sampler)
                extras["mis036_compile_s"] = round(time.time() - t0, 1)
                t0 = time.time()
                pipe.generate(meta, num_images=num_images, steps=steps,
                              mis=0.36, seed=1, sampler=sampler)
                extras["mis036_img_s"] = round(
                    num_images / (time.time() - t0), 4
                )
                print(f"bench: mis=0.36 extra {extras['mis036_img_s']} img/s",
                      file=sys.stderr, flush=True)
            except Exception as e:  # noqa: BLE001 — never lose the headline
                extras["mis036_error"] = f"{type(e).__name__}: {e}"[:200]
        else:
            extras["mis036_error"] = "skipped: bench time budget exhausted"
        _emit(_result())

    if not skip_extras:
        # full-config training step (README recipe: batch/GPU=8 on 64 GPUs;
        # we time batch=4/chip as in docs/PERF.md). The pipeline's device
        # buffers are dropped first: fp32 master weights + Adam state need
        # the HBM.
        if _budget_left() > 1400:
            try:
                del pipe, imgs, prime, pending
                import gc
                gc.collect()
                extras.update(_train_extra())
                if "train_samples_s" in extras:
                    print(f"bench: train extra "
                          f"{extras['train_samples_s']} samples/s",
                          file=sys.stderr, flush=True)
            except Exception as e:  # noqa: BLE001
                extras["train_error"] = f"{type(e).__name__}: {e}"[:200]
        else:
            extras["train_error"] = (
                "skipped: bench time budget too tight for the ~1250s "
                "full-config compile+run (measured r5)"
            )
        _emit(_result())


def _train_extra(batch: int = 4, n_steps: int = 8) -> dict:
    """Time the full-config training step (same path as tools/train_bench.py:
    ZeRO-free single-chip step_fn, fused-kernel custom VJPs, donated state).
    Returns {"train_samples_s": ..., "train_compile_s": ...}."""
    import jax
    import jax.numpy as jnp

    from instancediffusion_tpu.config import Config
    from instancediffusion_tpu.ops.schedules import make_diffusion_schedule
    from instancediffusion_tpu.train.optimizer import make_optimizer
    from instancediffusion_tpu.train.train_step import (
        cast_frozen_bf16, init_train_state, make_train_step,
    )

    cfg = Config()
    state = init_train_state(cfg)
    tx = make_optimizer(params=state.unet_params)
    state = state._replace(opt_state=jax.jit(tx.init)(state.unet_params))
    state = cast_frozen_bf16(state)
    step_fn = jax.jit(
        make_train_step(cfg, make_diffusion_schedule(), tx),
        donate_argnums=(0,),
    )

    rng = np.random.default_rng(0)
    g = cfg.model.grounding_tokenizer
    b = batch
    batch_data = {
        "image": jnp.asarray(rng.standard_normal((b, 512, 512, 3)), jnp.float32),
        "caption_ids": jnp.asarray(rng.integers(0, 49408, (b, 77)), jnp.int32),
        "boxes": jnp.asarray(rng.uniform(0, 1, (b, 30, 4)), jnp.float32),
        "masks": jnp.ones((b, 30), jnp.float32),
        "text_masks": jnp.ones((b, 30), jnp.float32),
        "image_masks": jnp.zeros((b, 30), jnp.float32),
        "text_embeddings": jnp.asarray(
            rng.standard_normal((b, 30, 768)), jnp.float32
        ),
        "image_embeddings": jnp.zeros((b, 30, 768), jnp.float32),
        "points": jnp.asarray(rng.uniform(0, 1, (b, 30, 2)), jnp.float32),
        "scribbles": jnp.asarray(
            rng.uniform(0, 1, (b, 30, g.n_scribble_points * 2)), jnp.float32
        ),
        "polygons": jnp.asarray(
            rng.uniform(0, 1, (b, 30, g.n_polygon_points * 2)), jnp.float32
        ),
        "segs": jnp.zeros(
            (b, 30, g.seg_resize_input, g.seg_resize_input), jnp.float32
        ),
    }

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    state, metrics = step_fn(state, batch_data, key)
    float(metrics["loss"])
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(n_steps):
        state, metrics = step_fn(state, batch_data, jax.random.fold_in(key, i))
    float(metrics["loss"])
    dt = (time.time() - t0) / n_steps
    return {
        "train_samples_s": round(batch / dt, 2),
        "train_batch": batch,
        "train_compile_s": round(compile_s, 1),
    }


def main():
    """Parent orchestrator: pure Python, never touches JAX. Runs the device
    work in a child process (`bench.py --child`) that streams `@RESULT`
    snapshot lines; the parent always prints exactly ONE final JSON line to
    stdout — the newest snapshot — even when

      * the driver's timeout SIGTERMs us mid-extra (the r5 bench takes
        ~45 min with the train extra; headline alone is ~15-25 min), or
      * the child wedges inside JAX C++ on a dead tunnel (signal handlers
        can't run there — r3 postmortem — but the parent sits in Python
        and can kill the child), or
      * an extra OOMs/crashes after the headline completed.

    Exit 0 iff a headline value was measured."""
    import queue
    import signal
    import subprocess
    import threading

    wall_s = float(os.environ.get("BENCH_WALL_S", "3400"))
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), CHILD_FLAG],
        stdout=subprocess.PIPE, text=True,
    )
    last: dict | None = None
    stop_reason: str | None = None

    def _on_signal(signum, frame):  # noqa: ARG001
        nonlocal stop_reason
        stop_reason = f"terminated by signal {signum}"

    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)

    lines: queue.Queue = queue.Queue()

    def _reader():
        for line in child.stdout:
            lines.put(line)
        lines.put(None)

    threading.Thread(target=_reader, daemon=True).start()

    deadline = time.time() + wall_s
    eof = False
    while not eof and stop_reason is None:
        if time.time() > deadline:
            stop_reason = f"bench wall budget {wall_s:.0f}s exhausted"
            break
        try:
            # 1 s granularity keeps the parent in Python bytecode so the
            # SIGTERM handler is never deferred behind a blocking C call
            line = lines.get(timeout=1.0)
        except queue.Empty:
            continue
        if line is None:
            eof = True
        elif line.startswith("@RESULT "):
            last = json.loads(line[len("@RESULT "):])

    if not eof:
        child.terminate()
        try:
            child.wait(timeout=15)
        except subprocess.TimeoutExpired:
            child.kill()
            child.wait()
        # drain any snapshot that raced the kill
        while True:
            try:
                line = lines.get(timeout=1.0)
            except queue.Empty:
                break
            if line is None:
                break
            if line.startswith("@RESULT "):
                last = json.loads(line[len("@RESULT "):])
    else:
        child.wait()

    if last is None:
        last = {
            "metric": "images_per_sec_per_chip_50step_512px_4inst",
            "value": None, "unit": "img/s/chip", "vs_baseline": None,
            "error": (stop_reason or f"child exited rc={child.returncode}")
            + " before the headline completed",
        }
    elif stop_reason is not None and "extra" in last:
        last["extra"]["extras_truncated"] = stop_reason
    print(json.dumps(last), flush=True)
    return 0 if last.get("value") is not None else 3


if __name__ == "__main__":
    if CHILD_FLAG in sys.argv:
        sys.exit(_child_main())
    sys.exit(main())
