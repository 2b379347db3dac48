"""Training state pytree."""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray  # scalar int32 — optimizer-level step counter
    params: Any
    opt_state: Any
    batch_stats: Optional[Any] = None  # frozen BN stats (RN towers)
    ema_params: Optional[Any] = None

    @property
    def model_variables(self):
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v

    def ema_variables(self):
        v = {"params": self.ema_params if self.ema_params is not None else self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v
