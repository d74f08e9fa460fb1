"""Multi-process (DCN-analog) payload: run as 2 OS processes, each
owning 4 forced-host CPU devices, forming one 8-device global mesh over
``jax.distributed`` — the single-host stand-in for multi-host batch
sharding over DCN (SURVEY §2.8 comm backend; the round-3 VERDICT's one
"partial" component).

Checks, per process:
  1. the global batch [8, H, W, 3] is sharded over the global mesh via
     ``make_array_from_process_local_data`` (each process contributes
     its local 4 images — the multi-host input-distribution pattern);
  2. the device JPEG coefficient pipeline runs under one pjit over the
     cross-process mesh;
  3. each process packs ITS addressable shards to scan bytes with the
     native packer and asserts them byte-identical to the single-process
     host-tier encoding of the same images;
  4. one real cross-process collective (replicated global sum of the
     coefficient digest) must agree with the digest of the full batch
     computed locally — proving the collective actually crossed the
     process boundary.

Prints ``DCN-OK <pid>`` and exits 0 on success.
"""

import os
import sys

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)


def main() -> int:
    pid = int(sys.argv[1])
    port = sys.argv[2]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=pid,
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    from pixo_tpu.jpeg.encoder import (_device_coeffs_batch,
                                       compute_coefficients_host)
    from pixo_tpu.jpeg.tables import HuffmanTables, QuantizationTables
    from pixo_tpu.native import native_available, native_pack_scan
    from pixo_tpu.jpeg import packer
    from pixo_tpu.options import ColorType, JpegOptions, Subsampling
    from pixo_tpu.ops.blockify import scan_layout

    assert len(jax.local_devices()) == 4 and len(jax.devices()) == 8, (
        "expected 4 local / 8 global devices"
    )

    # deterministic batch: every process constructs the same 8 images
    h = w = 64
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base = np.clip(np.stack([xx * 3, yy * 4, xx + yy], -1), 0, 255).astype(
        np.uint8
    )
    imgs = np.stack([np.roll(base, 5 * i, axis=1) for i in range(8)])

    q = QuantizationTables(85)
    lum = jnp.asarray(q.luminance_table.reshape(8, 8))
    chrom = jnp.asarray(q.chrominance_table.reshape(8, 8))

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("b",))
    sharding = NamedSharding(mesh, P("b"))
    # multi-host input distribution: each process feeds only ITS images
    local = imgs[pid * 4:(pid + 1) * 4]
    garr = jax.make_array_from_process_local_data(sharding, local, imgs.shape)

    @jax.jit
    def pipeline(ims):
        zz = _device_coeffs_batch(ims, lum, chrom, color="rgb",
                                  subsampling="444")
        digest = (
            zz.astype(jnp.int32) * (jnp.arange(64, dtype=jnp.int32) + 1)
        ).sum()
        return zz, digest

    zz_g, digest_g = jax.jit(
        pipeline,
        out_shardings=(sharding, NamedSharding(mesh, P())),
    )(garr)

    # 3. per-process byte equality on the addressable shards
    _, _, pattern = scan_layout(w, h, "rgb", "444")
    tables = HuffmanTables()
    opts = JpegOptions(width=w, height=h, quality=85,
                       color_type=ColorType.RGB,
                       subsampling=Subsampling.S444)
    pack = (lambda zz: native_pack_scan(zz, pattern, tables, None)) \
        if native_available() else \
        (lambda zz: packer.pack_scan(zz, pattern, tables, None))
    checked = 0
    for shard in zz_g.addressable_shards:
        i = shard.index[0].start
        got = pack(np.asarray(shard.data)[0])
        want = pack(compute_coefficients_host(imgs[i], opts, q))
        assert got == want, f"shard {i}: sharded bytes != single-process"
        checked += 1
    assert checked == 4, f"expected 4 addressable shards, got {checked}"

    # 4. the replicated digest crossed processes: compare to a local
    # full-batch computation
    want_digest = int(
        (
            np.concatenate(
                [compute_coefficients_host(im, opts, q)[None] for im in imgs]
            ).astype(np.int64)
            * (np.arange(64, dtype=np.int64) + 1)
        ).sum()
    )
    got_digest = int(np.asarray(digest_g))
    assert got_digest == want_digest, (
        f"cross-process digest {got_digest} != local {want_digest}"
    )

    print(f"DCN-OK {pid}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
