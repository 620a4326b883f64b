from .checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint


def check_dcn_offset_margin(model, variables, batch, *, win: int = 24,
                            tile: int = 8, rng=None):
    """Run one forward collecting per-DCN-block max |offset| and compare
    against the Pallas kernel's representable window.

    The fused DCN kernel (ops/pallas/dcn_kernel.py) drops bilinear
    corners beyond ±(win - tile - 3)/2 feature px of their static tap —
    value AND gradient. A converted checkpoint (or a training run) whose
    offsets exceed that margin silently produces wrong features; this
    check makes the failure loud. Returns
    ``{"max_offset", "margin", "per_block", "ok"}``; call it after
    ``Trainer.load_torch_pretrained`` and periodically during
    from-scratch training (reference has no analog: mmcv DCNv2 samples
    unboundedly).
    """
    import jax
    import jax.numpy as jnp

    margin = (win - tile - 3) / 2.0
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    _, inter = model.apply(
        variables, batch["imgs"], batch["projection_mat"],
        batch["image_wh"], occ_xyz=batch["occ_xyz"],
        occ_label=batch["occ_label"], occ_cam_mask=batch["occ_cam_mask"],
        training=False, rng=rng, mutable=["intermediates"])

    per_block = {}

    def walk(tree, path):
        for k, v in tree.items():
            if k == "dcn_offset_max":
                per_block[path] = float(jax.device_get(jnp.max(
                    jnp.stack(list(v)))))
            elif isinstance(v, dict):
                walk(v, f"{path}/{k}" if path else k)

    walk(inter["intermediates"], "")
    max_off = max(per_block.values(), default=0.0)
    return {"max_offset": max_off, "margin": margin,
            "per_block": per_block, "ok": max_off <= margin}
