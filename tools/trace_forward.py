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
    from __graft_entry__ import _flagship_model_and_batch

    model, batch, cfg = _flagship_model_and_batch(small=False)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": rng, "dropout": rng},
        batch["imgs"], batch["projection_mat"], batch["image_wh"],
        occ_xyz=batch["occ_xyz"], occ_label=batch["occ_label"],
        occ_cam_mask=batch["occ_cam_mask"], training=False, rng=rng)

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


def summarize(outdir):
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
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X":
            continue
        args = ev.get("args") or {}
        # device op events carry run_id/hlo fields; host events don't
        if "long_name" in args or "hlo_op" in args or "hlo_module" in args:
            name = ev.get("name", "?")
            dur = ev.get("dur", 0) / 1e3  # us → ms
            per_op[name] += dur
            total += dur
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:30]
    print(f"# total device op time: {total:.1f} ms (3 iterations)")
    for name, ms in top:
        print(f"{ms:9.2f} ms  {name[:110]}")
    # grouped by op family (strip trailing .<id> / digits)
    import re as _re
    fam = defaultdict(float)
    for name, ms in per_op.items():
        fam[_re.sub(r"[.\d]+$", "", name)] += ms
    print("# --- by family ---")
    for name, ms in sorted(fam.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{ms:9.2f} ms  {name[:80]}")


if __name__ == "__main__":
    main()
