"""Time one full-size flagship TRAIN step (forward + loss + backward +
AdamW) on the real chip — the training-side companion to bench.py.

    python tools/bench_train_step.py [iters]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from __graft_entry__ import _flagship_model_and_batch
    from gaussianformer_tpu.train.optim import build_optimizer
    from gaussianformer_tpu.train.train_state import create_train_state
    from gaussianformer_tpu.train.step import build_loss

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    t0 = time.perf_counter()
    model, batch, cfg = _flagship_model_and_batch(small=False)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("training",))(
        {"params": rng, "dropout": rng},
        batch["imgs"], batch["projection_mat"], batch["image_wh"],
        occ_xyz=batch["occ_xyz"], occ_label=batch["occ_label"],
        occ_cam_mask=batch["occ_cam_mask"], training=True, rng=rng)
    print(f"# init {time.perf_counter() - t0:.1f}s", flush=True)

    loss_fn = build_loss(cfg)
    tx, _ = build_optimizer(variables["params"], cfg.optim.lr, 1000,
                            backbone_lr_mult=cfg.optim.backbone_lr_mult,
                            grad_max_norm=cfg.optim.grad_max_norm)
    state = create_train_state(variables, tx)

    def train_step(state, batch, rng):
        def compute_loss(params):
            out = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["imgs"], batch["projection_mat"], batch["image_wh"],
                occ_xyz=batch["occ_xyz"], occ_label=batch["occ_label"],
                occ_cam_mask=batch["occ_cam_mask"], training=True,
                rng=rng, rngs={"dropout": jax.random.fold_in(rng, 1)})
            loss, logs = loss_fn(out)
            return loss, logs

        (loss, logs), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        return state.apply_gradients(grads), loss

    jitted = jax.jit(train_step, donate_argnums=(0,))
    state, loss = jitted(state, batch, jax.random.PRNGKey(1))
    print(f"# compile+warmup {time.perf_counter() - t0:.1f}s "
          f"loss={float(jax.device_get(loss)):.3f}", flush=True)

    t1 = time.perf_counter()
    for i in range(iters):
        state, loss = jitted(state, batch, jax.random.PRNGKey(2 + i))
    loss_v = float(jax.device_get(loss))
    dt = (time.perf_counter() - t1) / iters
    print(f"train step: {dt * 1e3:.0f} ms  ({1.0 / dt:.2f} steps/s, "
          f"loss {loss_v:.3f})")
    print(json.dumps({
        "metric": "prob_gs6400_train_step_ms",
        "value": round(dt * 1e3, 1), "unit": "ms",
        "steps_per_s": round(1.0 / dt, 3),
        "loss_finite_decreasing": bool(loss_v < 1e4),
    }))


if __name__ == "__main__":
    main()
