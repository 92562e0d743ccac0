"""Wave-granular checkpoint manifests — the resume mechanism.

Reference analog: file-granular download cache with md5 skip
(``dblpclient.py:340-350,442-451``).  Here the unit is a WAVE: after
every wave the driver commits, atomically (tmp + rename), a manifest
holding the frontier (backlog) parquet path, the per-shard seen-set
snapshot paths, the next fetch sequence number, and cumulative
metrics.  ``latest_manifest`` finds the newest committed wave; a
killed run resumes from it with zero re-fetches because every
payload/backlog/snapshot referenced by a committed manifest was
written before the rename.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field
from pathlib import Path


@dataclass
class WaveManifest:
    wave: int
    next_fetch_seq: int
    backlog_path: str
    seen_snapshots: list[str]
    payload_path: str
    crawl_log_path: str
    metrics: dict = field(default_factory=dict)
    cumulative: dict = field(default_factory=dict)
    # True when backlog_path holds FULL per-partition rest files; False
    # for delta waves (admitted keys + new rows only — resume replays
    # the chain back to the latest full snapshot)
    backlog_full: bool = True
    # partition count the backlog/seen files were written with; resume
    # must run with the SAME count or it would silently read a subset
    # of the part files and mis-route hosts (host_hash % n_shards).
    # 0 = manifest predates the field (validated via seen_snapshots).
    n_shards: int = 0

    def path(self, root: str) -> Path:
        return Path(root) / f"manifest_wave{self.wave:06d}.json"


def commit_manifest(root: str, m: WaveManifest) -> str:
    p = m.path(root)
    p.parent.mkdir(parents=True, exist_ok=True)
    tmp = p.with_suffix(".tmp")
    # fsync before the rename: a process kill is covered by the
    # tmp+rename alone, but a power loss / fs crash can journal the
    # rename while the data blocks never hit disk — a zero-length
    # manifest on reboot would break the zero-refetch resume with no
    # recovery path (review r04)
    with open(tmp, "w") as f:
        f.write(json.dumps(asdict(m), indent=1, sort_keys=True))
        f.flush()
        os.fsync(f.fileno())
    tmp.rename(p)  # atomic commit point
    _fsync_dir(p.parent)
    return str(p)


def _fsync_dir(d: Path) -> None:
    """Persist a directory entry (the rename itself) across power loss;
    best-effort on filesystems that refuse O_RDONLY dir fds."""
    try:
        fd = os.open(str(d), os.O_RDONLY)
    except OSError:
        return
    try:
        os.fsync(fd)
    except OSError:
        pass
    finally:
        os.close(fd)


def _manifest_wave_of(path: Path) -> int:
    return int(path.stem.replace("manifest_wave", ""))


def latest_manifest(root: str) -> WaveManifest | None:
    p = Path(root)
    if not p.exists():
        return None
    # numeric sort, not lexicographic: %06d names invert past wave
    # 999999 ('manifest_wave1000000' < 'manifest_wave0999999' as
    # strings), which would resume from a stale wave forever
    files = sorted(p.glob("manifest_wave*.json"), key=_manifest_wave_of)
    if not files:
        return None
    return WaveManifest(**json.loads(files[-1].read_text()))


def load_manifest(root: str, wave: int) -> WaveManifest | None:
    p = Path(root) / f"manifest_wave{wave:06d}.json"
    if not p.exists():
        return None
    return WaveManifest(**json.loads(p.read_text()))
