from .checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint


def dcn_margin(win: int, tile: int = 8) -> float:
    """Offset magnitude the Pallas DCN kernel samples exactly at window
    ``win``: the binding constraint is the per-tap row window,
    margin = (win - 2*tile)/2 (ops/pallas/dcn_kernel.py docstring)."""
    return (win - 2 * tile) / 2.0


def check_dcn_offset_margin(model, variables, batch, *, win: int = 24,
                            tile: int = 8, rng=None):
    """Run one forward collecting per-DCN-block max |offset| and compare
    against the Pallas kernel's representable window.

    The fused DCN kernel (ops/pallas/dcn_kernel.py) drops bilinear
    corners beyond ±(win - 2*tile)/2 feature px (rows; columns allow
    ±(win - tile - 3)/2) of their static tap — value AND gradient. A
    converted checkpoint (or a training run) whose offsets exceed that
    margin silently produces wrong features; this check makes the
    failure loud. Returns
    ``{"max_offset", "margin", "per_block", "ok"}``; call it after
    ``Trainer.load_torch_pretrained`` and periodically during
    from-scratch training (reference has no analog: mmcv DCNv2 samples
    unboundedly).
    """
    import jax
    import jax.numpy as jnp

    margin = dcn_margin(win, tile)
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

    # a model with no DCN stages sows nothing → no intermediates at all
    walk(inter.get("intermediates", {}), "")
    max_off = max(per_block.values(), default=0.0)
    return {"max_offset": max_off, "margin": margin,
            "per_block": per_block, "ok": max_off <= margin}


def all_dcn_offsets_zero(params) -> bool:
    """True iff every DCN ``conv_offset`` kernel/bias in the param tree
    is exactly zero — the init state (the reference zero-inits
    conv_offset, mmcv ModulatedDeformConv2dPack.init_weights; our
    ResNet mirrors that). Then max |offset| = 0 px and the narrowest
    Pallas window (``dcn_win=16``, margin 0) samples every corner
    exactly on the VALUE path — an inference-only narrowing: offset
    GRADIENTS need corners one pixel past the value margin, so training
    keeps the configured window (Trainer auto-widen).

    Host-side and O(params): cheaper than the forward-pass margin check
    when deciding the window for freshly initialized weights (bench /
    from-scratch eval); converted checkpoints have nonzero offsets and
    fall through to :func:`check_dcn_offset_margin`.
    """
    import jax
    import jax.numpy as jnp

    found = []

    def walk(tree):
        for k, v in tree.items():
            if not isinstance(v, dict):
                continue
            if k == "conv_offset":
                found.extend(jax.tree_util.tree_leaves(v))
            else:
                walk(v)

    walk(params)
    if not found:
        return False
    # one fused device computation + one transfer (a per-leaf get costs
    # one tunnel round-trip each on remote platforms)
    any_nonzero = jnp.any(jnp.stack([jnp.any(leaf != 0)
                                     for leaf in found]))
    return not bool(jax.device_get(any_nonzero))


def check_deformable_spill(model, variables, batch, *,
                           budget: int = 8192, rng=None):
    """Run one forward collecting per-deformable-call spill counts and
    compare against the fused kernel's cleanup budget.

    The fused deformable kernel zero-weights pairs whose bilinear
    corners escape a chunk's static x-window and recomputes them exactly
    with a ``spill_budget``-row gather (ops/deformable.py
    ``_spill_cleanup``); pairs BEYOND the budget are dropped — silent
    attention-mass loss, the same failure class as the DCN offset
    margin. Each DeformableFeatureAggregation sows its count as
    ``deformable_spill_count``. Returns ``{"max_spill", "budget",
    "per_call", "ok"}``; ``per_call`` is empty when the model runs the
    XLA backend (which never spills).
    """
    import jax
    import jax.numpy as jnp

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    _, inter = model.apply(
        variables, batch["imgs"], batch["projection_mat"],
        batch["image_wh"], occ_xyz=batch["occ_xyz"],
        occ_label=batch["occ_label"], occ_cam_mask=batch["occ_cam_mask"],
        training=False, rng=rng, mutable=["intermediates"])

    per_call = {}

    def walk(tree, path):
        for k, v in tree.items():
            if k == "deformable_spill_count":
                per_call[path] = int(jax.device_get(jnp.max(
                    jnp.stack(list(v)))))
            elif isinstance(v, dict):
                walk(v, f"{path}/{k}" if path else k)

    walk(inter.get("intermediates", {}), "")
    max_spill = max(per_call.values(), default=0)
    return {"max_spill": max_spill, "budget": budget,
            "per_call": per_call, "ok": max_spill <= budget}


def suggest_dcn_win(max_offset: float, *, tile: int = 8) -> int:
    """Smallest window (multiple of 8) whose margin covers
    ``max_offset``: margin = (win - 2*tile)/2 >= max_offset."""
    import math
    needed = int(math.ceil(2.0 * max_offset)) + 2 * tile
    return (needed + 7) // 8 * 8


def check_dcn_offset_margin_towers(params, batch_stats, cfg, *,
                                   image_size=(256, 448), rng=None,
                                   backbone_cfg=None,
                                   initializer_cfg=None):
    """Tower-only DCN offset-margin check for converted checkpoints.

    Runs JUST the two image towers (main R101 backbone and the lifter
    initializer tower) on synthetic normalized images — cheap enough for
    the converter CLI on CPU, where a full-model forward is not. The
    offsets are activations of the zero-to-trained ``conv_offset`` convs,
    so their magnitude is checkpoint-dependent; synthetic ~N(0,1) inputs
    (the scale of mean/std-normalized images) give a representative
    bound. Returns the merged result dict of
    :func:`check_dcn_offset_margin` plus ``suggested_win``.
    """
    import jax
    import jax.numpy as jnp

    from ..models.backbone.resnet import ResNet

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    win = getattr(cfg, "dcn_win", 24)
    margin = dcn_margin(win)
    h, w = image_size
    imgs = jax.random.normal(rng, (1, h, w, 3), jnp.float32)

    towers = []
    if "img_backbone" in params:
        towers.append(("img_backbone",
                       dict(backbone_cfg or cfg.backbone_cfg(),
                            with_cp=False),
                       params["img_backbone"],
                       batch_stats.get("img_backbone", {})))
    lift = params.get("lifter", {})
    if "initialize_backbone" in lift:
        towers.append((
            "lifter/initialize_backbone/img_backbone",
            dict(initializer_cfg
                 or dict(depth=101, style="caffe",
                         stage_with_dcn=(False, False, True, True),
                         dtype=cfg.compute_dtype, dcn_win=win),
                 with_cp=False),
            lift["initialize_backbone"]["img_backbone"],
            batch_stats["lifter"]["initialize_backbone"]["img_backbone"]))

    per_block = {}
    for name, bcfg, p, bs in towers:
        import jax.numpy as jnp  # noqa: F811
        bcfg["dtype"] = jnp.dtype(bcfg.get("dtype", "float32"))
        model = ResNet(**bcfg)
        _, inter = model.apply({"params": p, "batch_stats": bs}, imgs,
                               mutable=["intermediates"])

        def walk(tree, path):
            for k, v in tree.items():
                if k == "dcn_offset_max":
                    per_block[path] = float(jax.device_get(
                        jnp.max(jnp.stack(list(v)))))
                elif isinstance(v, dict):
                    walk(v, f"{path}/{k}")

        # a tower with no DCN stages sows nothing at all
        walk(inter.get("intermediates", {}), name)
    max_off = max(per_block.values(), default=0.0)
    return {"max_offset": max_off, "margin": margin,
            "per_block": per_block, "ok": max_off <= margin,
            "suggested_win": suggest_dcn_win(max_off)}
