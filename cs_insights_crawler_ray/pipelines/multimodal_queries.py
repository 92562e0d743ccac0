"""queries() adapters for the multimodal stages — deterministic
audio/video fixture tables (scale keyed to sf_dir) run through the
batch stages (rows-only oracle: the stub codecs are not
SQL-expressible; pytest verifies codec round-trips and feature
sanity in tests/test_dblp_multimodal.py)."""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..stages import multimodal as mm


def _n_for(sf_dir: str) -> int:
    sf = Path(sf_dir).name.replace("sf", "") or "0.01"
    return {"0.001": 20, "0.01": 60, "0.1": 200}.get(sf, 60)


def _audio_table(n: int, seed: int = 77) -> pa.Table:
    rng = np.random.Generator(np.random.PCG64(seed))
    ids, blobs, rates, lens, chans = [], [], [], [], []
    for i in range(n):
        rate = int(rng.choice([8000, 16000, 22050]))
        dur = int(rng.integers(rate // 2, rate * 2))
        t = np.arange(dur) / rate
        freq = float(rng.integers(100, 2000))
        wave = (np.sin(2 * np.pi * freq * t) * int(rng.integers(4000, 20000))).astype(
            np.int16
        )
        stereo = np.stack([wave, wave], axis=1)
        ids.append(f"clip{i:05d}")
        blobs.append(mm.encode_audio(stereo, rate))
        rates.append(rate); lens.append(dur); chans.append(2)
    return pa.table(
        {
            "clip_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "sample_rate": pa.array(rates, pa.int32()),
            "n_samples": pa.array(lens, pa.int64()),
            "channels": pa.array(chans, pa.int32()),
        }
    )


def _video_table(n: int, seed: int = 78) -> pa.Table:
    rng = np.random.Generator(np.random.PCG64(seed))
    ids, blobs, ws, hs, nf, fps = [], [], [], [], [], []
    for i in range(n):
        frames = rng.integers(
            0, 256, size=(int(rng.integers(6, 20)), 24, 24, 3), dtype=np.uint8
        )
        ids.append(f"vid{i:05d}")
        blobs.append(mm.encode_video(frames, 24.0))
        ws.append(24); hs.append(24); nf.append(frames.shape[0]); fps.append(24.0)
    return pa.table(
        {
            "video_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "n_frames": pa.array(nf, pa.int32()),
            "fps": pa.array(fps, pa.float32()),
        }
    )


def q36_audio_features(sf_dir: str) -> pd.DataFrame:
    """Audio decode + feature extraction over a deterministic clip
    table (binary payloads with typed metadata -> per-clip features).
    Small batch_size: encoded audio bytes dominate block size.
    Driver oracle: the same fixture run through the stage STRICTLY
    SEQUENTIALLY in one process (oracle_artifacts 'audio_seq') —
    execution parity: verifies Ray batching drops/duplicates/mangles
    nothing; the feature math itself is pytest-held
    (tests/test_dblp_multimodal.py)."""
    from ..pipelines.oracle_artifacts import ensure

    ensure("audio_seq", sf_dir)
    ds = rd.from_arrow(_audio_table(_n_for(sf_dir)))
    return (
        ds.map_batches(mm.audio_features_stage, batch_format="pyarrow", batch_size=16)
        .to_pandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )


def q37_video_frame_phashes(sf_dir: str) -> pd.DataFrame:
    """Video frame-sampling + per-frame phash (flat_map shape: one row
    per sampled frame).  Driver oracle: sequential single-process run
    of the same stage (oracle_artifacts 'video_seq') — see q36."""
    from ..pipelines.oracle_artifacts import ensure

    ensure("video_seq", sf_dir)
    ds = rd.from_arrow(_video_table(_n_for(sf_dir)))
    return (
        ds.map_batches(
            mm.video_frame_sample_stage, batch_format="pyarrow", batch_size=8
        )
        .to_pandas()
        .sort_values(["video_id", "frame_idx"])
        .reset_index(drop=True)
    )
