"""Pass timing with reliable device fencing.

The analog of the reference's GPU timestamp queries
(reference_path_tracer.cpp:472-480, 653-703): wall-clock sections fenced by a
jitted scalar reduction, because `block_until_ready` can return while work is
still queued behind the axon tunnel. Timings land in 30-entry rolling deques
like the reference's perf UI.
"""

from __future__ import annotations

import collections
import contextlib
import time


class PassTimer:
    def __init__(self, window: int = 30):
        self._durations: dict[str, collections.deque] = {}
        self._window = window

    @contextlib.contextmanager
    def section(self, name: str, fence_value=None):
        """Time a section; pass a jnp array as fence_value to synchronize on
        the device work that produced it."""
        t0 = time.time()
        yield
        if fence_value is not None:
            import jax
            import jax.numpy as jnp

            float(jax.jit(jnp.sum)(fence_value.reshape(-1)[:16]))
        self._durations.setdefault(
            name, collections.deque(maxlen=self._window)
        ).append(time.time() - t0)

    def averages_ms(self) -> dict[str, float]:
        return {
            name: 1000.0 * sum(d) / len(d) for name, d in self._durations.items() if d
        }

    def report(self) -> str:
        return "  ".join(f"{k}: {v:.1f}ms" for k, v in self.averages_ms().items())
