"""Corpus management (tests/support/kodak.rs analog).

Two tiers:
- a checked-in deterministic photographic corpus (``tests/fixtures/
  corpus_*.png``: 512x512 crops derived from the reference repo's public
  fixture images, re-encoded with Pillow) so photographic conformance and
  ratio regression never skip offline;
- optional downloaded suites (Kodak), verified by SHA-256. Entries without
  a known digest use trust-on-first-use: the digest is recorded next to
  the file on first download and enforced on every later load — there is
  no "accept anything" bypass.
"""

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

FIXTURES_DIR = Path(__file__).resolve().parent.parent / "fixtures"


@dataclasses.dataclass(frozen=True)
class CorpusFile:
    name: str
    url: str
    sha256: Optional[str] = None  # None => pin on first verified download


# Kodak Lossless True Color Suite subset (the reference uses r0k.us).
# No egress in this sandbox, so the true digests cannot be pre-pinned;
# trust-on-first-use pins them at download time.
KODAK_SUBSET: List[CorpusFile] = [
    CorpusFile("kodim01.png", "http://r0k.us/graphics/kodak/kodak/kodim01.png"),
    CorpusFile("kodim03.png", "http://r0k.us/graphics/kodak/kodak/kodim03.png"),
]


def _sha256(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _pin_path(path: Path) -> Path:
    return path.with_suffix(path.suffix + ".sha256")


def fetch_corpus_file(spec: CorpusFile, timeout: float = 10.0) -> Optional[Path]:
    """Return a verified local path, downloading + pinning if needed.

    Returns None when offline or verification fails (caller should skip).
    """
    CACHE_DIR.mkdir(parents=True, exist_ok=True)
    path = CACHE_DIR / spec.name
    if path.exists():
        expected = spec.sha256
        if expected is None and _pin_path(path).exists():
            expected = _pin_path(path).read_text().strip()
        if expected is not None and _sha256(path) == expected:
            return path
        path.unlink()  # unverifiable or mismatched: re-download
        # (kodak.rs:141 behavior)
    try:
        with urllib.request.urlopen(spec.url, timeout=timeout) as resp:
            data = resp.read()
    except (urllib.error.URLError, OSError, ValueError):
        return None
    tmp = path.with_suffix(".part")
    tmp.write_bytes(data)
    digest = _sha256(tmp)
    if spec.sha256 is not None and spec.sha256 != digest:
        tmp.unlink()
        return None
    if spec.sha256 is None:  # trust-on-first-use: pin for later loads
        _pin_path(path).write_text(digest + "\n")
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


def local_corpus() -> List[Path]:
    """The checked-in deterministic photographic corpus (never skips)."""
    return sorted(FIXTURES_DIR.glob("corpus_*.png"))
