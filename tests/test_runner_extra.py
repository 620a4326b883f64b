"""Trainer helpers: host-side random_k layer draw (reference
gaussian_head.py:133-137) and inference-only state init."""
import dataclasses

import numpy as np

from gaussianformer_tpu.configs import get_config
from gaussianformer_tpu.train.runner import Trainer


def make_trainer(apply_loss_type):
    cfg = dataclasses.replace(get_config("prob_gs6400"),
                              apply_loss_type=apply_loss_type)
    return Trainer(cfg, train_loader=None, val_loader=None,
                   work_dir="/tmp/t", use_mesh=False)


def test_draw_loss_layers_random_1_is_none():
    t = make_trainer("random_1")
    assert t._draw_loss_layers() is None


def test_draw_loss_layers_all_is_none():
    t = make_trainer("all")
    assert t._draw_loss_layers() is None


def test_draw_loss_layers_random_3():
    t = make_trainer("random_3")
    np.random.seed(0)
    d = t.cfg.num_decoder
    seen = set()
    for _ in range(50):
        layers = t._draw_loss_layers()
        assert len(layers) == 3
        assert layers[-1] == d - 1          # last layer always supervised
        assert len(set(layers)) == 3        # draws without replacement
        assert all(0 <= x < d for x in layers)
        seen.add(layers)
    assert len(seen) > 1                    # actually random
