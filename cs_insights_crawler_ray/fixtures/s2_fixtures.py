"""Deterministic S2-release-shaped jsonl.gz fixtures.

Record shapes follow the reference exactly (FIXTURES.md §3; reference
``s2processor.py:60,87-89,144-150,158-164``), including its quirks:

- papers use camelCase ``authorId`` in the nested author list while
  the authors table uses lowercase ``authorid`` (s2processor.py:89,93)
- some papers carry ``openaccessinfo.externalids`` that must be
  promoted to top level (s2processor.py:158-164)
- metadata rows exist for corpusids absent from papers and vice versa
  (exercises the full-outer merge, s2processor.py:108-118)
- files are gzip JSONL named ``{table}_{index}.jsonl.gz``
  (s2client.py:146-157)
"""

from __future__ import annotations

import gzip
import json
from pathlib import Path

import numpy as np

SOURCES = ["ACL", "DBLP", "ArXiv", "PubMed", "PubMedCentral"]


def generate_release(cache_dir: str, n_papers: int = 300, n_files: int = 3,
                     seed: int = 42) -> dict:
    """Write papers/abstracts/authors jsonl.gz files; returns counts."""
    rng = np.random.Generator(np.random.PCG64(seed))
    out = Path(cache_dir)
    out.mkdir(parents=True, exist_ok=True)

    author_ids = [str(1000 + i) for i in range(n_papers // 2)]
    papers = []
    for cid in range(n_papers):
        ext = {s: (f"{s.lower()}/{cid}" if rng.random() < 0.4 else None) for s in SOURCES}
        n_auth = int(rng.integers(1, 4))
        auths = [
            {"authorId": author_ids[int(rng.integers(0, len(author_ids)))],
             "name": f"Author {cid}-{k}"}
            for k in range(n_auth)
        ]
        p = {
            "corpusid": cid,
            "title": f"Paper {cid}",
            "year": int(rng.integers(1990, 2024)),
            "url": f"https://s2.test/paper/{cid}",
            "authors": auths,
        }
        if rng.random() < 0.3:
            # externalids hidden under openaccessinfo -> promotion path
            p["openaccessinfo"] = {"externalids": ext}
        else:
            p["externalids"] = ext
        papers.append(p)

    abstracts = [
        {"corpusid": cid, "abstract": f"Abstract text {cid}"}
        for cid in range(n_papers)
        if rng.random() < 0.8
    ] + [{"corpusid": n_papers + 7, "abstract": "orphan abstract"}]

    authors = [
        {"authorid": aid, "name": f"Author named {aid}",
         "url": f"https://s2.test/author/{aid}",
         "hindex": int(rng.integers(0, 80))}
        for aid in author_ids
    ] + [{"authorid": "9999", "name": "Unused", "url": "https://s2.test/author/9999",
          "hindex": 1}]

    def write(table: str, rows: list) -> None:
        per = max(1, len(rows) // n_files)
        for i in range(n_files):
            chunk = rows[i * per: (i + 1) * per if i < n_files - 1 else len(rows)]
            with gzip.open(out / f"{table}_{i}.jsonl.gz", "wt") as f:
                for r in chunk:
                    f.write(json.dumps(r) + "\n")

    write("papers", papers)
    write("abstracts", abstracts)
    write("authors", authors)
    return {"papers": len(papers), "abstracts": len(abstracts), "authors": len(authors)}
