"""Convert a reference PyTorch checkpoint to this framework's format.

    python tools/convert_checkpoint.py --config prob_gs6400 \
        --torch-ckpt path/to/state_dict.pth --out out/prob64_converted

Produces an orbax checkpoint directory (``ckpt_000000000`` + ``latest``
pointer) that ``eval.py --work-dir out/prob64_converted`` picks up
directly, enabling the BASELINE.md fidelity evals (20.04 mIoU Prob-64 /
19.31 NonEmpty-25600) without retraining.
"""
from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="prob_gs6400")
    ap.add_argument("--torch-ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--strict", action="store_true",
                    help="fail on any unmapped reference key")
    ap.add_argument("--skip-dcn-margin-check", action="store_true",
                    help="skip the DCN offset-margin tower check")
    ap.add_argument("--allow-out-of-margin", action="store_true",
                    help="write the checkpoint even if DCN offsets "
                         "exceed the Pallas window margin")
    args = ap.parse_args()

    import numpy as np
    import torch

    from gaussianformer_tpu.configs import get_config
    from gaussianformer_tpu.utils.checkpoint import save_checkpoint
    from gaussianformer_tpu.utils.torch_convert import (
        convert_full_state_dict)

    cfg = get_config(args.config)
    sd = torch.load(args.torch_ckpt, map_location="cpu",
                    weights_only=False)
    sd = sd.get("state_dict", sd)
    sd = {k: v for k, v in sd.items()}

    params, stats, unmapped = convert_full_state_dict(
        sd, cfg.operation_order, lifter="v1" if cfg.version == 1 else "v2")
    n_total = len(sd)
    print(f"mapped {n_total - len(unmapped)}/{n_total} reference keys")
    if unmapped:
        print("unmapped:")
        for k in unmapped[:40]:
            print("  ", k)
        if args.strict:
            raise SystemExit(1)

    if not args.skip_dcn_margin_check:
        # Out-of-margin DCN offsets are a silent-wrong-features hazard:
        # the fused Pallas kernel drops bilinear corners beyond
        # ±(dcn_win-11)/2 px of their static tap (value AND gradient).
        from gaussianformer_tpu.utils import check_dcn_offset_margin_towers
        res = check_dcn_offset_margin_towers(params, stats, cfg)
        print(f"DCN offset margin: max |offset| {res['max_offset']:.2f} px"
              f" vs margin {res['margin']:.2f} px (dcn_win="
              f"{cfg.dcn_win}) -> {'OK' if res['ok'] else 'EXCEEDED'}")
        if not res["ok"]:
            msg = (f"checkpoint offsets need dcn_win="
                   f"{res['suggested_win']}: evaluate with "
                   f"dataclasses.replace(get_config({args.config!r}), "
                   f"dcn_win={res['suggested_win']}) or rerun with "
                   f"--allow-out-of-margin to write anyway")
            if not args.allow_out_of_margin:
                raise SystemExit("ERROR: " + msg)
            print("WARNING:", msg)

    leaves = sum(1 for _ in _walk(params))
    print(f"writing {leaves} param tensors + "
          f"{sum(1 for _ in _walk(stats))} batch stats to {args.out}")
    save_checkpoint(args.out, 0, {
        "params": _to_np(params),
        "batch_stats": _to_np(stats),
        "epoch": 0, "global_iter": 0, "last_iter": 0,
    })
    print("done — evaluate with:")
    print(f"  python eval.py --config {args.config} --work-dir {args.out}")


def _walk(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _walk(v)
        else:
            yield v


def _to_np(tree):
    import numpy as np
    return {k: (_to_np(v) if isinstance(v, dict) else np.asarray(v))
            for k, v in tree.items()}


if __name__ == "__main__":
    main()
