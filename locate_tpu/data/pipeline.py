"""Host input pipeline with double-buffered device transfer.

Reference path (SURVEY.md §4.5): DataLoader worker -> decode -> resize ->
flip -> normalize -> pinned memory -> .to(device). TPU-native path here:

  * a background *producer thread* assembles uint8 numpy batches (decode,
    resize, flip are per-example host work; the 1-core TPU-VM equivalent of
    DataLoader workers),
  * batches cross host->device as **uint8** (4x less PCIe/DMA traffic than
    fp32; the [-1,1] normalize runs on-device inside the jitted train step),
  * `device_prefetch` keeps `depth` batches in flight on device (the
    double-buffering BASELINE asks for), so the step's input is already in
    HBM when the previous step retires,
  * under data parallelism the batch is device_put with a NamedSharding
    over the `data` mesh axis, so each replica receives only its shard
    (SURVEY.md §3.3 "per-host sharded batches").

Multi-host: each process constructs the pipeline with its
(process_index, process_count) so file/index sets are disjoint per host.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import jax
import numpy as np

Batch = Dict[str, np.ndarray]


class BatchProducer:
    """Background thread yielding uint8 batches from a dataset."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shard_index: int = 0,
        shard_count: int = 1,
        random_flip: bool = True,
        seed: int = 0,
        prefetch: int = 2,
        drop_remainder: bool = True,
        skip_examples: int = 0,
    ):
        if batch_size <= 0:
            raise ValueError("batch_size must be positive")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shard_index = shard_index
        self.shard_count = shard_count
        self.random_flip = random_flip
        self.seed = seed
        # Deterministic resume: the index stream is seeded per epoch, so
        # skipping N examples replays exactly the post-checkpoint stream
        # without decoding the skipped ones (SURVEY.md §6 checkpoint/resume).
        self.skip_examples = skip_examples
        self._queue: "queue.Queue[Batch]" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _epoch_stream(self):
        """Per epoch: (indices, flips) arrays for the non-skipped tail.

        RNG discipline (the resume invariant): per epoch, the permutation is
        drawn first, then — when random_flip — exactly ONE uniform draw per
        iterated example, in stream order, vectorized (`Generator.random(n)`
        consumes the bit stream identically to n scalar draws). Skipped
        examples consume their draw but are not yielded; entirely-skipped
        epochs consume nothing (matching the original scalar stream).
        `example()`/`batch_fast()` must never consume this RNG.
        """
        epoch = 0
        n = len(self.dataset)
        to_skip = self.skip_examples
        while not self._stop.is_set():
            rng = np.random.Generator(
                np.random.Philox(key=self.seed, counter=epoch)
            )
            perm = rng.permutation(n)
            shard = perm[self.shard_index :: self.shard_count]
            epoch += 1
            if to_skip >= len(shard):
                to_skip -= len(shard)
                continue
            if self.random_flip:
                flips = rng.random(len(shard)) < 0.5
            else:
                flips = np.zeros(len(shard), bool)
            yield shard[to_skip:], flips[to_skip:]
            to_skip = 0

    def _assemble(self, indices, flips) -> Batch:
        if self._use_fast:
            try:
                imgs, labs = self.dataset.batch_fast(indices, flips)
                return {"image": imgs, "label": labs}
            except RuntimeError:
                # fast path structurally unavailable: permanent fallback
                self._use_fast = False
            except OSError:
                # corrupt file: fall back for this batch only — PIL may
                # still decode it
                pass
        # rng is never passed to example(): the stream RNG is consumed only
        # by the flip decision, one draw per example (resume invariant).
        images, labels = [], []
        for i, fl in zip(indices, flips):
            img, label = self.dataset.example(int(i), None)
            if fl:
                img = img[:, ::-1]
            images.append(np.ascontiguousarray(img))
            labels.append(label)
        return {
            "image": np.stack(images),
            "label": np.asarray(labels, np.int32),
        }

    def _run(self):
        self._use_fast = hasattr(self.dataset, "batch_fast")
        bs = self.batch_size
        buf_idx: list = []
        buf_flip: list = []
        try:
            for idxs, flips in self._epoch_stream():
                pos = 0
                while pos < len(idxs):
                    if self._stop.is_set():
                        return
                    take = min(bs - len(buf_idx), len(idxs) - pos)
                    buf_idx.extend(idxs[pos : pos + take])
                    buf_flip.extend(flips[pos : pos + take])
                    pos += take
                    if len(buf_idx) < bs:
                        break  # epoch exhausted; continue filling next epoch
                    batch = self._assemble(buf_idx, buf_flip)
                    buf_idx, buf_flip = [], []
                    while not self._stop.is_set():
                        try:
                            self._queue.put(batch, timeout=0.5)
                            break
                        except queue.Full:
                            continue
        except Exception as e:  # surface worker errors to the consumer
            # Same timeout-loop as the normal put path: if the consumer has
            # already stopped draining, a blocking put would park this
            # daemon thread forever holding the batch.
            while not self._stop.is_set():
                try:
                    self._queue.put({"__error__": e}, timeout=0.5)  # type: ignore[dict-item]
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator[Batch]:
        while True:
            batch = self._queue.get()
            if "__error__" in batch:
                raise batch["__error__"]  # type: ignore[misc]
            yield batch

    def close(self):
        self._stop.set()


def device_prefetch(
    host_batches: Iterator[Batch],
    sharding: Optional[jax.sharding.Sharding] = None,
    depth: int = 2,
) -> Iterator[Batch]:
    """Keep `depth` batches resident on device ahead of the consumer
    (double buffering for depth=2). `sharding` scatters the batch over the
    `data` mesh axis for DP.

    Multi-host: each process feeds only its local shard (the producer
    already walks a disjoint index set); `make_array_from_process_local_data`
    assembles the logical GLOBAL batch from per-host data, so the jitted
    global-program step sees one (global_batch, ...) array exactly as in
    single-process runs.
    """
    import collections

    buf = collections.deque()
    multihost = jax.process_count() > 1

    def put_one(x):
        if sharding is None:
            return jax.device_put(x)
        if multihost:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    for batch in host_batches:
        buf.append(jax.tree.map(put_one, batch))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


class InputPipeline:
    """Closeable batch iterator: `close()` stops the producer thread and
    drops the device-resident prefetch buffers (callers must close — a
    leaked producer keeps decoding and pins `prefetch` batches in HBM)."""

    def __init__(self, producer: BatchProducer, iterator: Iterator[Batch],
                 dataset):
        self._producer = producer
        self._iterator = iterator
        self.dataset = dataset

    def __iter__(self):
        return self

    def __next__(self) -> Batch:
        return next(self._iterator)

    def close(self) -> None:
        self._producer.close()
        self._iterator = iter(())

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def make_input_pipeline(
    data_cfg,
    global_batch: int,
    *,
    sharding: Optional[jax.sharding.Sharding] = None,
    seed: int = 0,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
    skip_batches: int = 0,
    steps_per_call: int = 1,
    d_steps: int = 1,
) -> InputPipeline:
    """Dataset -> producer thread -> device prefetch, per-host sharded.
    `skip_batches` deterministically fast-forwards the stream for resume
    (always counted in OPTIMIZER steps, independent of `steps_per_call`
    stacking; with a critic ratio each optimizer step consumes `d_steps`
    batches, which the fast-forward accounts for)."""
    from locate_tpu.data.datasets import make_dataset

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if global_batch % pc:
        raise ValueError(f"global_batch {global_batch} not divisible by {pc} hosts")
    dataset = make_dataset(data_cfg)
    per_host = global_batch // pc
    k = steps_per_call
    c = d_steps
    # With steps_per_call / d_steps the producer assembles one
    # (k*c*per_host) batch per dispatch — identical example/flip order to
    # k*c consecutive per_host batches (the epoch stream is consumed
    # sequentially either way) — and the [k][c](per_host, ...) scan layout
    # is a FREE reshape view, so all assembly/copy work stays on the
    # producer thread (stack_batches on the consumer thread would re-copy
    # the batches).
    producer = BatchProducer(
        dataset,
        per_host * k * c,
        shard_index=pi,
        shard_count=pc,
        random_flip=data_cfg.random_flip,
        seed=seed,
        prefetch=data_cfg.prefetch,
        skip_examples=skip_batches * per_host * c,
    )
    # leading scan axes (omitted when 1): [k] steps_per_call, [c] d_steps
    lead = tuple(d for d in (k, c) if d > 1)
    if not lead:
        host_it = iter(producer)
    else:
        host_it = (
            {
                key: v.reshape(*lead, per_host, *v.shape[1:])
                for key, v in b.items()
            }
            for b in producer
        )
    it = device_prefetch(host_it, sharding, depth=data_cfg.prefetch)
    return InputPipeline(producer, it, dataset)
