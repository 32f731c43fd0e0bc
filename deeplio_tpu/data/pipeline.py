"""Host->device input pipeline: threaded prefetch with double buffering.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=N)``
process pool (SURVEY.md §3.1 process boundary). The heavy transform
(projection) moved on-device, so the host side only reads scans, slices
IMU windows and computes GT — cheap enough for a thread. Batches are
device_put with the mesh's batch sharding while the TPU computes the
previous step, hiding transfer latency (BASELINE.json: "double-buffers
projected frames into HBM" — we double-buffer raw scans and project
on-device, which is strictly less host->device traffic for <=5 channels).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import jax
import numpy as np

from deeplio_tpu.parallel.mesh import Mesh, batch_sharding


class DevicePrefetcher:
    """Wrap a host batch iterator; yields device-resident sharded batches.

    Multi-process: the iterator yields this process's LOCAL rows (see
    ``WindowDataset.iter_batches(process_index=...)``); pass the global
    batch size and each local block is assembled into one global sharded
    array via ``jax.make_array_from_process_local_data`` — no host ever
    materializes rows it doesn't feed.
    """

    def __init__(self, it: Iterator[Dict[str, np.ndarray]], mesh: Mesh,
                 depth: int = 2, global_batch_size: Optional[int] = None):
        self._it = it
        self._sharding = batch_sharding(mesh)
        self._global_bs = global_batch_size
        self._multiproc = jax.process_count() > 1
        self._q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._fill, daemon=True)
        self._thread.start()

    def _put_batch(self, batch: Dict[str, np.ndarray]):
        if self._multiproc:
            from deeplio_tpu.data.dataset import _FLAT_KEYS
            from deeplio_tpu.parallel.multihost import make_global_batch
            gbs = self._global_bs
            if gbs is None:
                # Derive from a WINDOW-level key: the flat plane keys
                # (_FLAT_KEYS) carry B*S rows, and using one of those as
                # the batch size would fail make_global_batch's per-key
                # divisibility check for every window-level key.
                win = [v.shape[0] for k, v in batch.items()
                       if k not in _FLAT_KEYS]
                if not win:
                    raise ValueError(
                        "cannot derive global_batch_size from a batch of "
                        "only flat plane keys — pass global_batch_size")
                gbs = min(win) * jax.process_count()
            return make_global_batch(self._sharding, batch, gbs)
        return {k: jax.device_put(v, self._sharding) for k, v in batch.items()}

    def _fill(self):
        try:
            for batch in self._it:
                batch.pop("meta", None)
                self._q.put(self._put_batch(batch))
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            self._q.put(None)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is None:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
