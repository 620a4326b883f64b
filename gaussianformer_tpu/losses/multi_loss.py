"""Loss composition (reference loss/multi_loss.py + loss/base_loss.py):
each term remaps model outputs via an input_dict and is weighted; the total
and the per-term scalars are returned for logging."""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Sequence, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LossTerm:
    name: str
    weight: float
    fn: Callable[..., jnp.ndarray]
    input_keys: Tuple[str, ...]


class MultiLoss:
    def __init__(self, terms: Sequence[LossTerm]):
        self.terms = list(terms)

    def __call__(self, inputs: Dict) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        tot = 0.0
        log = {}
        for term in self.terms:
            val = term.fn(*[inputs[k] for k in term.input_keys])
            val = term.weight * val
            tot = tot + val
            log[term.name] = val
        return tot, log
