"""Trace-timed comparison of row-permutation strategies for the fused
deformable prep's anchor-level sort gather ([6, 6400] anchor order over
140-float rows). Wall-clock microbenches are dispatch-noisy over the
axon tunnel, so durations come from the profiler trace.

    python tools/bench_gather_variants.py
"""
import glob, gzip, json, os, sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp


def trace_time(fn, args, outdir, iters=6):
    fn = jax.jit(fn)
    o = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[:2])
    with jax.profiler.trace(outdir):
        for _ in range(iters):
            o = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[:2])
    files = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    tot = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        a = ev.get("args") or {}
        if "long_name" in a or "hlo_op" in a or "hlo_module" in a:
            tot += ev.get("dur", 0) / 1e3
    return tot / iters


def main():
    cams, p, cols = 6, 6400, 140
    key = jax.random.PRNGKey(0)
    packed = jax.random.normal(key, (cams, p, cols), jnp.float32)
    order = jnp.argsort(
        jax.random.uniform(key, (cams, p)), axis=-1).astype(jnp.int32)

    def v_take_along(packed, order):
        return jnp.take_along_axis(packed, order[..., None], axis=1)

    def v_flat(packed, order):
        flat = packed.reshape(cams * p, cols)
        idx = (order + jnp.arange(cams, dtype=order.dtype)[:, None] * p
               ).reshape(-1)
        return flat[idx].reshape(cams, p, cols)

    def v_take(packed, order):
        flat = packed.reshape(cams * p, cols)
        idx = (order + jnp.arange(cams, dtype=order.dtype)[:, None] * p
               ).reshape(-1)
        return jnp.take(flat, idx, axis=0).reshape(cams, p, cols)

    def v_chunked(packed, order):
        # 512-row chunks via scan (the deformable generic path's trick)
        flat = packed.reshape(cams * p, cols)
        idx = (order + jnp.arange(cams, dtype=order.dtype)[:, None] * p
               ).reshape(-1)
        chunks = idx.reshape(-1, 512)

        def body(_, ic):
            return 0, flat[ic]

        _, out = jax.lax.scan(body, 0, chunks)
        return out.reshape(cams, p, cols)

    def v_sortkv(packed, order):
        # carry an inverse-rank key and ride lax.sort
        rank = jnp.zeros((cams, p), jnp.int32).at[
            jnp.arange(cams)[:, None], order].set(
            jnp.broadcast_to(jnp.arange(p, dtype=jnp.int32), (cams, p)))
        ops = [rank] + [packed[..., i] for i in range(cols)]
        out = jax.lax.sort(ops, dimension=1, num_keys=1)
        return jnp.stack(out[1:], axis=-1)

    outdir = "/tmp/gather_trace"
    for name, fn in [("take_along_axis", v_take_along),
                     ("flat_bracket", v_flat),
                     ("take", v_take),
                     ("chunked_scan", v_chunked)]:
        ms = trace_time(fn, (packed, order), outdir)
        print(f"{name:18s} {ms:7.2f} ms")
    got = jax.device_get(v_flat(packed, order))
    want = jax.device_get(v_take_along(packed, order))
    print("match:", bool(np.allclose(got, want)))


if __name__ == "__main__":
    main()
