"""Capture a jax.profiler device trace of the bench UNet forward (the hot
loop of the headline benchmark) on the real TPU, then parse the xplane with
xprof/tensorboard_plugin_profile into a plain-text op breakdown.

Usage:
  python tools/profile_bench.py [--out docs/traces/r2] [--batch 8] [--steps 3]

Outputs:
  <out>/plugins/profile/...   raw trace (open with TensorBoard's profile tab)
  <out>/op_breakdown.txt      top self-time ops (committed for the record)
"""


from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable uninstalled

import argparse
import glob
import json
import os
import sys
import time


def capture(out_dir: str, batch: int, iters: int) -> None:
    import jax
    import jax.numpy as jnp

    from instancediffusion_tpu.config import Config, apply_test_preset
    from instancediffusion_tpu.models import unet, unifusion

    cfg = apply_test_preset(Config(), "box").model
    params = jax.jit(lambda k: unet.init_unet(k, cfg))(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    g = unifusion.null_grounding(batch, cfg.max_objs, cfg.grounding_tokenizer)
    drops = unifusion.ModalityDrops.test_defaults(cfg.grounding_tokenizer)
    objs, _ = jax.jit(
        lambda p, g: unifusion.apply_unifusion(
            p["position_net"], cfg.grounding_tokenizer, g, drops
        )
    )(params, g)

    x = jax.random.normal(
        jax.random.PRNGKey(1), (batch, 64, 64, 4), jnp.bfloat16
    )
    t = jnp.full((batch,), 500, jnp.int32)
    ctx = jax.random.normal(
        jax.random.PRNGKey(2), (batch, 77, 768), jnp.bfloat16
    )

    fwd = jax.jit(
        lambda p, x, t, c, o: unet.apply_unet(
            p, cfg, x, t, c, None, gate_scale=1.0, precomputed_objs=o
        )
    )
    # compile + warm
    out = fwd(params, x, t, ctx, objs)
    print("warm:", float(jnp.sum(out.astype(jnp.float32))), file=sys.stderr)

    t0 = time.time()
    n_timed = 10
    for _ in range(n_timed):
        out = fwd(params, x, t, ctx, objs)
    s = float(jnp.sum(out.astype(jnp.float32)))  # sync
    dt = (time.time() - t0) / n_timed
    print(f"fwd: {dt*1e3:.1f} ms (B={batch}) sync={s}", file=sys.stderr)

    jax.profiler.start_trace(out_dir)
    for _ in range(iters):
        out = fwd(params, x, t, ctx, objs)
    float(jnp.sum(out.astype(jnp.float32)))
    jax.profiler.stop_trace()
    print("trace captured to", out_dir, file=sys.stderr)


def parse(out_dir: str) -> None:
    """xplane.pb -> framework op stats table (self-time ranked)."""
    paths = glob.glob(
        os.path.join(out_dir, "plugins/profile/*/*.xplane.pb")
    )
    if not paths:
        print("no xplane.pb found under", out_dir, file=sys.stderr)
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    rows_out = []
    for tool in ("framework_op_stats", "op_profile"):
        try:
            data, _ = rtd.xspace_to_tool_data(paths, tool, {})
        except Exception as e:  # tool coverage varies by version
            print(f"tool {tool} failed: {e}", file=sys.stderr)
            continue
        fname = os.path.join(out_dir, f"{tool}.json")
        with open(fname, "w") as f:
            f.write(data if isinstance(data, str) else data.decode())
        rows_out.append(fname)
    print("parsed:", rows_out, file=sys.stderr)


def summarize(out_dir: str, top: int = 40) -> None:
    """framework_op_stats.json -> op_breakdown.txt (committed artifact)."""
    fname = os.path.join(out_dir, "framework_op_stats.json")
    if not os.path.exists(fname):
        return
    with open(fname) as f:
        data = json.load(f)
    # gviz table format: {cols: [...], rows: [{c: [{v: ...}, ...]}]}
    try:
        table = data[0] if isinstance(data, list) else data
        cols = [c["label"] for c in table["cols"]]
        rows = []
        for r in table["rows"]:
            rows.append([c.get("v") if c else None for c in r["c"]])
    except Exception as e:
        print("unrecognized json layout:", e, file=sys.stderr)
        return
    want = [c for c in (
        "Type", "Operation", "#Occurrences", "Total self-time (us)",
        "Total self-time (%)", "Cumulative total-self time (%)",
    ) if c in cols]
    idx = [cols.index(c) for c in want]
    st_col = cols.index("Total self-time (us)") if "Total self-time (us)" in cols else None
    if st_col is not None:
        rows.sort(key=lambda r: -(r[st_col] or 0))
    lines = ["\t".join(want)]
    for r in rows[:top]:
        lines.append("\t".join(str(r[i]) for i in idx))
    out = os.path.join(out_dir, "op_breakdown.txt")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines[: top + 1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/traces/r2")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--parse-only", action="store_true")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    if not args.parse_only:
        capture(args.out, args.batch, args.iters)
    parse(args.out)
    summarize(args.out)


if __name__ == "__main__":
    main()
