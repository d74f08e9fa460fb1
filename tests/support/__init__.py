"""Test corpus support: SHA-256-pinned download cache with skip-if-offline.

Mirrors the reference's tests/support/{pngsuite,kodak,jpeg_corpus}.rs
discipline: external corpora are fetched on demand, verified against
pinned digests, cached locally, and tests skip cleanly when the network
is unavailable (this environment has zero egress, so the cache only
serves files that are already present locally).
"""

from .corpus import (
    CorpusFile,
    fetch_corpus_file,
    kodak_subset,
    local_corpus,
    pngsuite_files,
)
