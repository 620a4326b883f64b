"""A/B: two separate per-tower convs vs one channel-stacked grouped conv.

The two R101 towers (main backbone + lifter initializer) have identical
topology at identical shapes; pairing them keeps one conv call per layer
with feature_group_count=2 and channel-stacked weights. This measures
whether XLA's TPU lowering of fgc=2 actually beats two sequential convs
at the flagship stage shapes before we commit to the paired-trunk
refactor (VERDICT r3 item 1a).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def timeit(fn, *args, iters=30):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else \
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def conv(x, w, fgc=1, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=fgc)


def main():
    key = jax.random.PRNGKey(0)
    # (name, B, H, W, C, k) — R101 3x3 conv2 shapes at 864x1600 input
    shapes = [
        ("stage2 3x3", 6, 108, 200, 128, 3),
        ("stage3 3x3", 6, 54, 100, 256, 3),
        ("stage4 3x3", 6, 27, 50, 512, 3),
        ("stage3 1x1 expand", 6, 54, 100, 256, 1),
        ("stage2 3x3 bf16", 6, 108, 200, 128, 3),
    ]
    for name, b, h, w, c, k in shapes:
        dt = jnp.bfloat16
        cout = c * (4 if k == 1 else 1)
        x1 = jax.random.normal(key, (b, h, w, c), dt)
        x2 = jax.random.normal(key, (b, h, w, c), dt)
        w1 = jax.random.normal(key, (k, k, c, cout), dt) * 0.05
        w2 = jax.random.normal(key, (k, k, c, cout), dt) * 0.05

        @jax.jit
        def sep(x1, x2, w1, w2):
            return conv(x1, w1), conv(x2, w2)

        @jax.jit
        def paired(xs, w1, w2):
            ws = jnp.concatenate([w1, w2], axis=-1)
            return conv(xs, ws, fgc=2)

        xs = jnp.concatenate([x1, x2], axis=-1)
        t_sep = timeit(lambda a, b_, c_, d: sep(a, b_, c_, d),
                       x1, x2, w1, w2)
        t_pair = timeit(lambda a, b_, c_: paired(a, b_, c_), xs, w1, w2)
        # numerics check
        o1, o2 = sep(x1, x2, w1, w2)
        op = paired(xs, w1, w2)
        err = float(jnp.max(jnp.abs(
            jnp.concatenate([o1, o2], axis=-1).astype(jnp.float32)
            - op.astype(jnp.float32))))
        flops = 2 * b * h * w * c * cout * k * k * 2  # both towers
        print(f"{name:22s} sep {t_sep:7.3f} ms  paired {t_pair:7.3f} ms  "
              f"({flops/t_sep/1e9:6.1f} vs {flops/t_pair/1e9:6.1f} TF/s)  "
              f"maxerr {err:.3e}")


if __name__ == "__main__":
    main()
