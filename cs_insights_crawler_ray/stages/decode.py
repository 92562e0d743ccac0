"""Decode-verify stage — stateless ``map_batches`` producing payload
rows in the input_hint schema.

Verify-on-ingest is the analog of the reference's md5
local-vs-remote hard check (``dblpclient.py:437-451``), upgraded per
BASELINE.json: decode the image, compare against the ground-truth
pixels regenerated from the URL (pure function of the seed), and gate
lossless formats on exact equality / lossy formats on PSNR >= 40 dB.
Failures are poison rows (``ok=False``), filtered to a quarantine
count, never exceptions.

Batch sizing: rows carry encoded image bytes, so the caller passes a
small ``batch_size`` (payload bytes dominate block size — SURVEY.md
§7.5 "wide binary rows").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..fixtures.content_store import ContentStoreConfig, page_pixels
from ..functions.imagecodec import LOSSY, decode_image, phash64, psnr

PSNR_GATE_DB = 40.0


class DecodeVerifyStage:
    def __init__(self, cfg: ContentStoreConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url_canon"].to_pylist()
        shas = batch["url_sha1"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        statuses = batch["status"].to_pylist()
        ids, ws, hs, fmts, phashes, oks = [], [], [], [], [], []
        for u, sha, blob, st in zip(urls, shas, blobs, statuses):
            ids.append(sha.hex())
            if st != "200":
                ws.append(0); hs.append(0); fmts.append(""); phashes.append(0); oks.append(False)
                continue
            try:
                pixels, fmt = decode_image(blob)
            except ValueError:
                ws.append(0); hs.append(0); fmts.append(""); phashes.append(0); oks.append(False)
                continue
            truth = page_pixels(self.cfg, u)
            if fmt in LOSSY:
                ok = psnr(pixels, truth) >= PSNR_GATE_DB
            else:
                ok = pixels.shape == truth.shape and bool(np.array_equal(pixels, truth))
            h, w = pixels.shape[:2]
            ws.append(w); hs.append(h); fmts.append(fmt)
            phashes.append(phash64(pixels)); oks.append(ok)
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "bytes": batch["bytes"],
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "fmt": pa.array(fmts, pa.string()),
                "caption": batch["caption"],
                "phash": pa.array(phashes, pa.int64()),
                "ok": pa.array(oks, pa.bool_()),
            }
        )
