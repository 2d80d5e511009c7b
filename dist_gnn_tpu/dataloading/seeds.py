"""Epoch seed batching (device-resident, static shapes).

Counterpart of ``DistGNN.dataloading.SeedGenerator``
(``python/DistGNN/dataloading/dataloader.py:4-45``): shuffle on device once
per epoch, then yield contiguous fixed-size batches.  The last partial batch
is padded with INVALID_ID + mask instead of being ragged, so every step has
identical shapes and hits the same compiled executable.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import jax
import jax.numpy as jnp

from dist_gnn_tpu.graph import INVALID_ID


class SeedGenerator:
    def __init__(
        self,
        data: jnp.ndarray,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
    ):
        self.data = jnp.asarray(data, dtype=jnp.int32)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        n = self.data.shape[0]
        if drop_last:
            self.num_batches = n // self.batch_size
        else:
            self.num_batches = -(-n // self.batch_size)

    def __len__(self) -> int:
        return self.num_batches

    def epoch(self, key: jax.Array) -> Iterator[Tuple[jnp.ndarray, jnp.ndarray]]:
        """Yield (seeds[batch_size], mask[batch_size]) pairs."""
        n = self.data.shape[0]
        data = self.data
        if self.shuffle:
            data = jax.random.permutation(key, data)
        pad = self.num_batches * self.batch_size - n
        if pad > 0:
            data = jnp.concatenate(
                [data, jnp.full((pad,), INVALID_ID, jnp.int32)]
            )
        elif pad < 0:  # drop_last truncation
            data = data[: self.num_batches * self.batch_size]
        batches = data.reshape(self.num_batches, self.batch_size)
        for i in range(self.num_batches):
            seeds = batches[i]
            yield seeds, seeds != INVALID_ID
