"""Batched data loading with background prefetch.

Replaces Dassl's torch ``DataLoader`` + ``DatasetWrapper`` stack (reference
``trainers/client_datamanager.py:65-103``).  Batches are plain numpy dicts:

* device pipeline: ``{"canvas" u8 (B,S,S,3), "box" f32 (B,4), "flip" bool,
  "label" i32, "caption" [str], "impath" [str]}``
* host pipeline:   ``{"img" f32 (B,H,W,3), "label", "caption", "impath"}``

A daemon thread decodes the next batches while the device computes
(double-buffering across the host->HBM boundary).  Samplers mirror Dassl's
full set: ``RandomSampler`` / ``SequentialSampler`` plus the structured
``RandomDomainSampler`` / ``SeqDomainSampler`` (``n_domain`` domains x
``batch_size // n_domain`` images per batch) and ``RandomClassSampler``
(``batch_size // n_ins`` classes x ``n_ins`` instances — the re-ID
identity sampler), selected by ``cfg.DATALOADER.*.SAMPLER``.
"""

from __future__ import annotations

import queue
import threading
from typing import List, Optional

import numpy as np

from federated_multi_modal_tpu.data.datum import Datum


def _sample_random_domain(rng, data_source, batch_size, n_domain,
                          sequential=False):
    """Flat index order for Random/SeqDomainSampler: repeatedly pick
    ``n_domain`` domains (random; SeqDomainSampler always cycles ALL
    domains in order, like Dassl, ignoring ``n_domain``) and draw
    ``batch_size // n_domain`` images from each without replacement, until
    a picked domain can no longer fill its share."""
    by_domain: dict = {}
    for i, item in enumerate(data_source):
        by_domain.setdefault(item.domain, []).append(i)
    domains = sorted(by_domain)
    if sequential or not n_domain or n_domain <= 0:
        n_domain = len(domains)
    if n_domain > len(domains):
        raise ValueError(
            f"DATALOADER N_DOMAIN={n_domain} but the data source has only "
            f"{len(domains)} domain(s) ({domains}) — lower N_DOMAIN or use "
            "a non-domain sampler"
        )
    per_domain = batch_size // n_domain
    if per_domain <= 0:
        raise ValueError(
            f"batch_size {batch_size} < n_domain {n_domain}"
        )
    pools = {d: list(by_domain[d]) for d in domains}
    order: list = []
    while True:
        if sequential:
            picked = domains
        else:
            picked = list(rng.choice(domains, size=n_domain, replace=False))
        if any(len(pools[d]) < per_domain for d in picked):
            break
        for d in picked:
            pool = pools[d]
            take = rng.choice(len(pool), size=per_domain, replace=False)
            take_set = set(int(t) for t in take)
            order.extend(pool[t] for t in sorted(take_set))
            pools[d] = [x for k, x in enumerate(pool) if k not in take_set]
    if not order:
        sizes = {d: len(by_domain[d]) for d in domains}
        raise ValueError(
            f"domain sampler cannot form a single batch: needs "
            f"{per_domain} images per domain, domain sizes are {sizes}"
        )
    return np.asarray(order, np.int64)


def _sample_random_class(rng, data_source, batch_size, n_ins):
    """Flat index order for RandomClassSampler (identity sampler): each
    batch holds ``batch_size // n_ins`` random classes with ``n_ins``
    instances each; classes with fewer than ``n_ins`` images are upsampled
    with replacement."""
    if batch_size < n_ins:
        raise ValueError(f"batch_size {batch_size} < n_ins {n_ins}")
    cls_per_batch = batch_size // n_ins
    by_label: dict = {}
    for i, item in enumerate(data_source):
        by_label.setdefault(item.label, []).append(i)
    if len(by_label) < cls_per_batch:
        raise ValueError(
            f"need >= {cls_per_batch} classes, have {len(by_label)}"
        )
    groups: dict = {}
    for label, idxs in by_label.items():
        idxs = list(idxs)
        if len(idxs) < n_ins:
            extra = rng.choice(idxs, size=n_ins - len(idxs), replace=True)
            idxs = idxs + [int(x) for x in extra]
        perm = rng.permutation(len(idxs))
        idxs = [idxs[p] for p in perm]
        groups[label] = [
            idxs[s : s + n_ins]
            for s in range(0, len(idxs) - n_ins + 1, n_ins)
        ]
    avail = sorted(groups)
    order: list = []
    while len(avail) >= cls_per_batch:
        picked = rng.choice(len(avail), size=cls_per_batch, replace=False)
        for label in [avail[p] for p in sorted(int(x) for x in picked)]:
            order.extend(groups[label].pop(0))
            if not groups[label]:
                avail.remove(label)
    return np.asarray(order, np.int64)


class DataLoader:
    def __init__(
        self,
        data_source: List[Datum],
        batch_size: int,
        transform,
        is_train: bool = True,
        sampler_type: str = "RandomSampler",
        n_domain: int = 0,
        n_ins: int = 16,
        drop_last: Optional[bool] = None,
        seed: int = 0,
        prefetch_depth: int = 2,
        cache_decoded: bool = True,
        cache_budget_bytes: int = 4 << 30,
        decode_threads: Optional[int] = None,
    ):
        self.data_source = list(data_source)
        self.batch_size = batch_size
        self.transform = transform
        self.is_train = is_train
        self.sampler_type = sampler_type
        self.n_domain = n_domain
        self.n_ins = n_ins
        self.drop_last = is_train if drop_last is None else drop_last
        self.rng = np.random.default_rng(seed)
        self.prefetch_depth = prefetch_depth
        # native batch-decode thread count (the reference's NUM_WORKERS
        # analogue, but threads in one process instead of forked torch
        # workers); None = all cores
        self.decode_threads = decode_threads
        # Decoded-canvas cache (device pipeline only): augmentation happens
        # on device from the uint8 canvas, so caching the canvas is
        # lossless — from epoch 2 the host does zero JPEG decoding.  This
        # is the TPU-side answer to the reference's 8 dataloader workers;
        # few-shot canvases are small (16-shot x 100 classes ~ 300 MB).
        # ``cache_budget_bytes`` caps host RAM: once reached, further
        # samples stay uncached (ImageNet-scale full splits decode per
        # epoch like the reference's workers do).
        self.cache_decoded = (
            cache_decoded and getattr(transform, "mode", "host") == "device"
        )
        self._canvas_cache: dict = {}
        self._cache_budget = cache_budget_bytes
        self._cache_bytes = 0
        # serializes the cache check-then-add: _reap_worker detaches a
        # worker still stuck past its join timeout, so two workers can
        # briefly coexist — unlocked accounting could double-count an
        # index's bytes and overshoot the RAM budget
        self._cache_lock = threading.Lock()
        # the next epoch's batch plan (structured samplers realize a
        # different number of batches than len(data)/batch_size, so len()
        # and iteration must share one plan)
        self._plan: Optional[list] = None
        self._stop_worker: Optional[threading.Event] = None
        # serializes every use of self.rng: _index_batches (consumer thread,
        # via __len__/_next_plan/__iter__) vs transform.sample_params (the
        # prefetch worker inside _make_batch).  A lock — not a worker reap —
        # so that len(loader) during a live epoch stays non-destructive.
        self._rng_lock = threading.Lock()

    def _structured(self) -> bool:
        return self.sampler_type in (
            "RandomDomainSampler", "SeqDomainSampler", "RandomClassSampler"
        )

    def _reap_worker(self) -> None:
        """Stop and join an abandoned prefetch worker from a previous,
        partially consumed epoch (a consumer that bails mid-epoch — e.g. a
        NaN hard-raise — would otherwise leave the old thread running).
        Called only from ``__iter__``: rng safety against a still-live
        worker is provided by ``_rng_lock``, so ``__len__`` stays
        non-destructive during an active epoch."""
        if self._stop_worker is not None:
            self._stop_worker.set()
            self._stop_worker = None
        if getattr(self, "_worker_thread", None) is not None:
            self._worker_thread.join(timeout=30.0)
            self._worker_thread = None

    def _next_plan(self) -> list:
        if self._plan is None:
            with self._rng_lock:
                self._plan = self._index_batches()
        return self._plan

    def __len__(self):
        if self._structured():
            return len(self._next_plan())
        n = len(self.data_source)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self):
        n = len(self.data_source)
        st = self.sampler_type
        if st in ("RandomDomainSampler", "SeqDomainSampler"):
            idx = _sample_random_domain(
                self.rng, self.data_source, self.batch_size, self.n_domain,
                sequential=(st == "SeqDomainSampler"),
            )
            n = len(idx)
        elif st == "RandomClassSampler":
            idx = _sample_random_class(
                self.rng, self.data_source, self.batch_size, self.n_ins
            )
            n = len(idx)
        else:
            idx = np.arange(n)
            if st == "RandomSampler" and self.is_train:
                self.rng.shuffle(idx)
        batches = []
        for s in range(0, n, self.batch_size):
            chunk = idx[s : s + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                break
            batches.append(chunk)
        return batches

    def _decode_many(self, paths):
        """Decode a list of image paths to uint8 canvases.

        Uses the native C++ batch decoder (one threaded call per batch,
        ``native/imagecodec.cc``) when the transform has it enabled;
        individual failures and non-native transforms fall back to the
        per-file python path (PIL).
        """
        tfm = self.transform
        if getattr(tfm, "native", False):
            from federated_multi_modal_tpu import native as _native

            out = _native.decode_batch(
                paths, tfm.canvas, tfm.interp_name,
                crop_square=getattr(tfm, "crop_square", False),
                n_threads=self.decode_threads,
            )
            if out is not None:
                canvases, statuses = out
                return [
                    canvases[k] if statuses[k] == 0 else tfm.decode_pil(p)
                    for k, p in enumerate(paths)
                ]
        return [tfm(p) for p in paths]

    def _make_batch(self, chunk):
        items = [self.data_source[i] for i in chunk]
        batch = {
            "label": np.asarray([it.label for it in items], np.int32),
            "caption": [it.caption for it in items],
            "impath": [it.impath for it in items],
            "index": np.asarray(chunk, np.int64),
        }
        mode = getattr(self.transform, "mode", "host")
        if mode == "device":
            if self.cache_decoded:
                frames = [self._canvas_cache.get(i) for i in chunk]
                # duplicate indices in a chunk (RandomClassSampler upsamples
                # with replacement) decode once and count once
                miss_idx = {}
                for k, f in enumerate(frames):
                    if f is None:
                        miss_idx.setdefault(int(chunk[k]), []).append(k)
                if miss_idx:
                    uniq = list(miss_idx)
                    decoded = self._decode_many(
                        [self.data_source[i].impath for i in uniq]
                    )
                    for i, frame in zip(uniq, decoded):
                        for k in miss_idx[i]:
                            frames[k] = frame
                        with self._cache_lock:
                            if (
                                i not in self._canvas_cache
                                and self._cache_bytes + frame.nbytes
                                <= self._cache_budget
                            ):
                                self._canvas_cache[i] = frame
                                self._cache_bytes += frame.nbytes
                canvas = np.stack(frames)
            else:
                canvas = np.stack(
                    self._decode_many([it.impath for it in items])
                )
            with self._rng_lock:
                boxes, flips = self.transform.sample_params(
                    self.rng, len(items)
                )
            batch.update(canvas=canvas, box=boxes, flip=flips)
        else:
            imgs = np.stack([self.transform(it.impath) for it in items])
            batch["img"] = imgs.astype(np.float32)
        return batch

    def __iter__(self):
        self._reap_worker()
        batches = self._next_plan()
        self._plan = None  # next len()/iter() realizes a fresh plan
        if self.prefetch_depth <= 0:
            for chunk in batches:
                yield self._make_batch(chunk)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch_depth)
        sentinel = object()
        error_holder = []
        stop = threading.Event()
        self._stop_worker = stop

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for chunk in batches:
                    if stop.is_set():
                        return
                    if not put(self._make_batch(chunk)):
                        return
            except Exception as e:  # surface loader errors on the consumer
                error_holder.append(e)
            finally:
                put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        self._worker_thread = t
        t.start()
        try:
            while True:
                try:
                    item = q.get(timeout=0.2)
                except queue.Empty:
                    # a newer iterator over this loader set our stop event
                    # (concurrent live iterators are unsupported — newest
                    # wins, this epoch ends early), or the worker died
                    # without delivering its sentinel
                    if stop.is_set() or not t.is_alive():
                        if error_holder:
                            raise error_holder[0]
                        break
                    continue
                if item is sentinel:
                    if error_holder:
                        raise error_holder[0]
                    break
                yield item
        finally:
            stop.set()
            if self._stop_worker is stop:
                self._stop_worker = None
