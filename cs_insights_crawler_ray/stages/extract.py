"""Full-text extractor plugin surface — the reference's declared-but-
unimplemented extension point (reference ``types.py:32-36,54-61,73-89``:
``ExtractorType {GROBID, RULEBASED}``, ``PdfExtractionFn``), carried
forward with the same contract.

A registered extractor is a callable ``(pdf_bytes) -> dict`` run as a
batched stage; GROBID-style extractors hold a service/client handle
per worker process (the model-per-worker pattern every heavy stage in
this repo uses).  Neither backend ships in this sandbox, so both are
stubs that raise with the production recipe — but the registry, the
stage plumbing, and the poison-row behavior are real and tested.
"""

from __future__ import annotations

from enum import Enum
from typing import Callable

import pyarrow as pa

PdfExtractionFn = Callable[[bytes], dict]


class ExtractorType(str, Enum):
    GROBID = "grobid"
    RULEBASED = "rulebased"


def _grobid_extract(pdf_bytes: bytes) -> dict:  # pragma: no cover - stub
    raise NotImplementedError(
        "GROBID extraction needs a GROBID service; production shape: a "
        "per-worker-process HTTP client (cached like stages/fetch.py) "
        "posting to /api/processFulltextDocument, batch_size sized by "
        "PDF bytes"
    )


def _rulebased_extract(pdf_bytes: bytes) -> dict:  # pragma: no cover - stub
    raise NotImplementedError(
        "rule-based extraction needs a PDF parser (pdfminer/pypdf), "
        "absent in this sandbox"
    )


_REGISTRY: dict[ExtractorType, PdfExtractionFn] = {
    ExtractorType.GROBID: _grobid_extract,
    ExtractorType.RULEBASED: _rulebased_extract,
}


def register_extractor(kind: ExtractorType, fn: PdfExtractionFn) -> None:
    """Plugin point: swap in a real (or test) extractor.

    The registry is a PER-PROCESS global: a driver-side registration is
    invisible to Ray worker processes, which import this module fresh.
    For a distributed stage use ``make_extraction_stage`` — it resolves
    the function on the driver and closes over it, so cloudpickle ships
    the registered callable with the stage."""
    _REGISTRY[kind] = fn


def make_extraction_stage(kind: ExtractorType = ExtractorType.RULEBASED):
    """Driver-time factory: ``ds.map_batches(make_extraction_stage(k))``.
    Resolves the extractor from the DRIVER's registry and carries the
    function itself inside the returned closure — the bare
    ``extraction_stage`` would re-resolve from each worker's freshly
    imported registry, where ``register_extractor`` never ran, and die
    on the stub's NotImplementedError."""
    fn = _REGISTRY[ExtractorType(kind)]

    def stage(batch: pa.Table) -> pa.Table:
        return _run_extraction(batch, fn)

    return stage


def extraction_stage(batch: pa.Table, kind: ExtractorType = ExtractorType.RULEBASED) -> pa.Table:
    """Batched extraction over (doc_id, pdf_bytes); failures are
    poison rows (ok=False), never exceptions — same contract as
    decode-verify.  Resolves from the CURRENT process's registry (see
    make_extraction_stage for the distributed form)."""
    return _run_extraction(batch, _REGISTRY[ExtractorType(kind)])


def _run_extraction(batch: pa.Table, fn: PdfExtractionFn) -> pa.Table:
    ids, texts, oks = [], [], []
    for did, blob in zip(batch["doc_id"].to_pylist(), batch["pdf_bytes"].to_pylist()):
        ids.append(did)
        try:
            out = fn(blob)
            texts.append(out.get("text", ""))
            oks.append(True)
        except NotImplementedError:
            raise  # configuration error, not a data error
        except Exception:
            texts.append("")
            oks.append(False)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "ok": pa.array(oks, pa.bool_()),
        }
    )
