"""Capture a jax.profiler trace of the flagship forward and summarize
per-op device time from the trace events.

Usage: python tools/trace_forward.py [outdir]
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace"
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from __graft_entry__ import (_flagship_model_and_batch,
                                 narrow_dcn_win_for_inference)

    model, batch, cfg = _flagship_model_and_batch(small=False)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": rng, "dropout": rng},
        batch["imgs"], batch["projection_mat"], batch["image_wh"],
        occ_xyz=batch["occ_xyz"], occ_label=batch["occ_label"],
        occ_cam_mask=batch["occ_cam_mask"], training=False, rng=rng)
    model, dcn_win = narrow_dcn_win_for_inference(model, cfg, variables)
    print(f"# dcn_win={dcn_win}", flush=True)

    @jax.jit
    def forward(variables, key):
        out = model.apply(
            variables, batch["imgs"], batch["projection_mat"],
            batch["image_wh"], occ_xyz=batch["occ_xyz"],
            occ_label=batch["occ_label"], occ_cam_mask=batch["occ_cam_mask"],
            training=False, rng=key)
        return out["final_occ"]

    # warmup/compile
    jax.device_get(forward(variables, jax.random.PRNGKey(1))[0, :4])
    t0 = time.perf_counter()
    jax.device_get(forward(variables, jax.random.PRNGKey(2))[0, :4])
    print(f"# forward: {(time.perf_counter() - t0)*1e3:.1f} ms", flush=True)

    with jax.profiler.trace(outdir):
        for i in range(3):
            out = forward(variables, jax.random.PRNGKey(3 + i))
        jax.device_get(out[0, :4])

    summarize(outdir)


def _bucket(op):
    """Map a tf_op scope path to a model-level budget bucket."""
    import re as _re
    parts = [p for p in (op or "").split("/")
             if p not in ("jit(forward)", "BEVSegmentor")]
    if not parts:
        return "(unattributed)"
    p0 = parts[0]
    if p0 == "img_backbone":
        m = _re.search(r"(stage\d|conv1|bn1)", op)
        return "main_tower/" + (m.group(1) if m else "other")
    if p0 == "lifter":
        if len(parts) > 1 and parts[1] == "initialize_backbone":
            return "lifter_tower"
        return "lifter_other"
    if p0 == "img_neck":
        return "main_neck"
    if p0 == "encoder":
        m = _re.match(r"op\d+_(\w+)", parts[1]) if len(parts) > 1 else None
        return "encoder/" + (m.group(1) if m else "other")
    if p0 == "head":
        return "head"
    return p0.split(":")[0]


def summarize(outdir, iters: int = 3):
    files = glob.glob(os.path.join(
        outdir, "**", "*.trace.json.gz"), recursive=True)
    if not files:
        print("no trace files under", outdir)
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find device-side lanes (TensorCore op events)
    per_op = defaultdict(float)
    op_meta = {}
    bucket = defaultdict(lambda: [0.0, 0])
    bucket_cat = defaultdict(float)
    total = 0.0
    nops = 0
    for ev in events:
        if ev.get("ph") != "X":
            continue
        args = ev.get("args") or {}
        # device op events carry run_id/hlo fields; host events don't
        if "long_name" in args or "hlo_op" in args or "hlo_module" in args:
            name = ev.get("name", "?")
            dur = ev.get("dur", 0) / 1e3  # us → ms
            per_op[name] += dur
            op_meta[name] = (args.get("tf_op", ""),
                             args.get("long_name", ""))
            total += dur
            nops += 1
            b = _bucket(args.get("tf_op", ""))
            bucket[b][0] += dur
            bucket[b][1] += 1
            bucket_cat[(b, args.get("hlo_category", "?"))] += dur
    print(f"# total device op time: {total/iters:.1f} ms/iter "
          f"({nops//iters} op events/iter)")
    print("# --- by model bucket (ms/iter) ---")
    for b, (ms, cnt) in sorted(bucket.items(), key=lambda kv: -kv[1][0]):
        cats = sorted(((c, v) for (bb, c), v in bucket_cat.items()
                       if bb == b), key=lambda kv: -kv[1])[:3]
        catstr = ", ".join(f"{c} {v/iters:.1f}" for c, v in cats)
        print(f"{ms/iters:9.2f} ms  x{cnt//iters:5d}  {b:24s} [{catstr}]")
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:25]
    print("# --- top single ops (with scope / long_name) ---")
    for name, ms in top:
        tf_op, long_name = op_meta.get(name, ("", ""))
        extra = tf_op or long_name
        print(f"{ms/iters:9.2f} ms  {name[:60]:60s}  {extra[:90]}")

    # the relayout-copy tax, itemized: 'data formatting' ops are pure
    # layout changes (copy/transpose/bitcast fusions) XLA inserts
    # between ops whose preferred layouts disagree
    fmt = defaultdict(float)
    fmt_meta = {}
    for ev in events:
        if ev.get("ph") != "X":
            continue
        args = ev.get("args") or {}
        if args.get("hlo_category", "") != "data formatting":
            continue
        name = ev.get("name", "?")
        fmt[name] += ev.get("dur", 0) / 1e3
        fmt_meta[name] = (args.get("tf_op", ""),
                          args.get("long_name", ""))
    ftop = sorted(fmt.items(), key=lambda kv: -kv[1])[:20]
    print("# --- top data-formatting (relayout) ops ---")
    for name, ms in ftop:
        tf_op, long_name = fmt_meta.get(name, ("", ""))
        extra = tf_op or long_name
        print(f"{ms/iters:9.2f} ms  {name[:48]:48s}  {extra[:100]}")

    # what hides in the unbucketed bucket (thousands of tiny events:
    # scan bodies, async DMA pairs, inter-bucket glue)
    ub = defaultdict(lambda: [0.0, 0])
    for ev in events:
        if ev.get("ph") != "X":
            continue
        args = ev.get("args") or {}
        if not ("long_name" in args or "hlo_op" in args
                or "hlo_module" in args):
            continue
        if _bucket(args.get("tf_op", "")) not in ("", "(unattributed)"):
            continue
        name = ev.get("name", "?")
        ub[name][0] += ev.get("dur", 0) / 1e3
        ub[name][1] += 1
    utop = sorted(ub.items(), key=lambda kv: -kv[1][0])[:15]
    print("# --- top unbucketed ops (ms, count/iter) ---")
    for name, (ms, cnt) in utop:
        print(f"{ms/iters:9.2f} ms  x{cnt//iters:5d}  {name[:80]}")


if __name__ == "__main__":
    main()
