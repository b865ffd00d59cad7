"""Batched data loading with background prefetch.

Replaces Dassl's torch ``DataLoader`` + ``DatasetWrapper`` stack (reference
``trainers/client_datamanager.py:65-103``).  Batches are plain numpy dicts:

* device pipeline: ``{"canvas" u8 (B,S,S,3), "box" f32 (B,4), "flip" bool,
  "label" i32, "caption" [str], "impath" [str]}``
* host pipeline:   ``{"img" f32 (B,H,W,3), "label", "caption", "impath"}``

A daemon thread decodes the next batches while the device computes
(double-buffering across the host->HBM boundary).  Samplers mirror Dassl's
``RandomSampler`` / ``SequentialSampler``.
"""

from __future__ import annotations

import queue
import threading
from typing import List, Optional

import numpy as np

from federated_multi_modal_tpu.data.datum import Datum


class DataLoader:
    def __init__(
        self,
        data_source: List[Datum],
        batch_size: int,
        transform,
        is_train: bool = True,
        sampler_type: str = "RandomSampler",
        drop_last: Optional[bool] = None,
        seed: int = 0,
        prefetch_depth: int = 2,
        cache_decoded: bool = True,
        cache_budget_bytes: int = 4 << 30,
    ):
        self.data_source = list(data_source)
        self.batch_size = batch_size
        self.transform = transform
        self.is_train = is_train
        self.sampler_type = sampler_type
        self.drop_last = is_train if drop_last is None else drop_last
        self.rng = np.random.default_rng(seed)
        self.prefetch_depth = prefetch_depth
        self.epoch = 0
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

    def __len__(self):
        n = len(self.data_source)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self):
        n = len(self.data_source)
        idx = np.arange(n)
        if self.sampler_type == "RandomSampler" and self.is_train:
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

            out = _native.decode_batch(paths, tfm.canvas, tfm.interp_name)
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
                misses = [k for k, f in enumerate(frames) if f is None]
                if misses:
                    decoded = self._decode_many(
                        [items[k].impath for k in misses]
                    )
                    for k, frame in zip(misses, decoded):
                        frames[k] = frame
                        i = chunk[k]
                        if self._cache_bytes + frame.nbytes <= self._cache_budget:
                            self._canvas_cache[i] = frame
                            self._cache_bytes += frame.nbytes
                canvas = np.stack(frames)
            else:
                canvas = np.stack(
                    self._decode_many([it.impath for it in items])
                )
            boxes, flips = self.transform.sample_params(self.rng, len(items))
            batch.update(canvas=canvas, box=boxes, flip=flips)
        else:
            imgs = np.stack([self.transform(it.impath) for it in items])
            batch["img"] = imgs.astype(np.float32)
        return batch

    def __iter__(self):
        batches = self._index_batches()
        self.epoch += 1
        if self.prefetch_depth <= 0:
            for chunk in batches:
                yield self._make_batch(chunk)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch_depth)
        sentinel = object()
        error_holder = []

        def worker():
            try:
                for chunk in batches:
                    q.put(self._make_batch(chunk))
            except Exception as e:  # surface loader errors on the consumer
                error_holder.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if error_holder:
                    raise error_holder[0]
                break
            yield item
