"""Batch-sharded execution over device meshes (SURVEY §2.8).

Images are independent, so data parallelism over the batch axis is the
core strategy: a 1D mesh shards [B, H, W, C] batches across chips and the
fused encode kernels run per-shard with zero cross-chip dependencies
(collectives only appear for host assembly). A second mesh axis can shard
*rows of one image* for the filter kernel — the up-row neighbor access
becomes an XLA-inserted halo exchange (this repo's ring-attention analog).
"""

from .mesh import batch_sharding, make_mesh
from .pipeline import (
    decode_jpeg_batch,
    decode_png_batch,
    encode_jpeg_batch_sharded,
    encode_jpeg_stream,
    encode_jpeg_stream_overlapped,
    encode_png_batch_sharded,
    encode_png_row_sharded,
    jpeg_coeffs_sharded,
    thumbnail_pipeline,
)
from .service import (
    CompressService,
    RequestCancelled,
    RequestTimeout,
    WorkerCrashed,
)

__all__ = [
    "make_mesh",
    "CompressService",
    "RequestTimeout",
    "RequestCancelled",
    "WorkerCrashed",
    "decode_jpeg_batch",
    "decode_png_batch",
    "batch_sharding",
    "jpeg_coeffs_sharded",
    "encode_jpeg_batch_sharded",
    "encode_jpeg_stream",
    "encode_jpeg_stream_overlapped",
    "encode_png_batch_sharded",
    "encode_png_row_sharded",
    "thumbnail_pipeline",
]
