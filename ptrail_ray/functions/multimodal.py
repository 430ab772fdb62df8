"""Multimodal (image/audio/video) column plumbing.

Design: media are opaque ``binary`` payload columns with typed metadata
(``media_type``, ``width``/``height``/``duration_ms``), processed by
actor-pool ``map_batches`` stages with SMALL batch sizes (payloads
dominate block size — see the memory notes in SURVEY.md §4.2).

The decode/resize/feature kernels themselves are STUBBED in this
container (no PIL/ffmpeg/librosa available): ``DecodeImage`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (seeded by payload bytes) produces
plausible-shaped outputs so the Ray-side plumbing — schema, batching,
actor lifecycle, output layout — is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("media_type", pa.string()),  # 'image' | 'audio' | 'video'
        pa.field("payload", pa.binary()),
        pa.field("meta_width", pa.int32()),
        pa.field("meta_height", pa.int32()),
        pa.field("meta_duration_ms", pa.int32()),
    ]
)


def synth_media(n: int = 64, seed: int = 21) -> pa.Table:
    """Deterministic fake media table (binary payloads)."""
    rng = np.random.default_rng(seed)
    types = rng.choice(["image", "audio", "video"], size=n)
    payloads = [rng.bytes(int(rng.integers(256, 4096))) for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "media_type": pa.array(types, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta_width": pa.array(rng.integers(64, 1024, n), pa.int32()),
            "meta_height": pa.array(rng.integers(64, 1024, n), pa.int32()),
            "meta_duration_ms": pa.array(rng.integers(0, 60_000, n), pa.int32()),
        }
    )


class DecodeImage:
    """Actor-pool decode stage (stub).

    Real implementation would hold the codec context per actor; here the
    deterministic fake derives a feature vector from the payload hash so
    outputs are stable for testing. ``fake=False`` raises
    NotImplementedError (no image libs in this container).
    """

    def __init__(self, fake: bool = False, feat_dim: int = 16):
        self.fake = fake
        self.feat_dim = feat_dim

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires PIL/libjpeg — not available in this "
                "container; pass fake=True for the deterministic stub"
            )
        feats = []
        for p in batch["payload"]:
            h = hashlib.md5(bytes(p)).digest()
            seed = int.from_bytes(h[:8], "big") % (2**32)
            feats.append(
                np.random.default_rng(seed).normal(size=self.feat_dim).astype(
                    np.float32
                )
            )
        batch["feature"] = [f.tolist() for f in feats]
        batch["decoded_ok"] = True
        return batch.drop(columns=["payload"])  # drop payload → small output


def decode_features(
    ds, *, fake: bool = False, concurrency: int | None = None, batch_size: int = 16
):
    """Media Dataset → per-item feature vectors (payload dropped on
    output; small batch_size because payloads dominate memory). The
    pool is pinned and cluster-sized by default (autoscaling pools ramp
    from 1 actor — stages/pool.py)."""
    from ptrail_ray.stages.pool import pool_size

    return ds.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency or pool_size(),
    )
