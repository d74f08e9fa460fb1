"""Public API surface stability (the lib.rs re-export contract analog)."""

import inspect


def test_top_level_exports():
    import pixo_tpu as p

    for name in [
        "ColorType", "FilterStrategy", "JpegOptions", "PngOptions",
        "QuantizationMode", "QuantizationOptions", "ResizeFilter",
        "ResizeOptions", "Subsampling", "errors", "jpeg", "png",
        "rgb_to_ycbcr", "__version__",
    ]:
        assert hasattr(p, name), name


def test_jpeg_module_surface():
    from pixo_tpu import jpeg

    for name in ["encode", "encode_into", "encode_batch",
                 "compute_coefficients", "HuffmanTables",
                 "QuantizationTables", "ZIGZAG"]:
        assert hasattr(jpeg, name), name


def test_png_module_surface():
    from pixo_tpu import png

    for name in ["encode", "encode_into", "encode_indexed",
                 "encode_indexed_with_options", "encode_batch"]:
        assert hasattr(png, name), name


def test_decode_surface():
    from pixo_tpu import decode

    for name in ["decode_png", "decode_jpeg", "PngImage", "JpegImage"]:
        assert hasattr(decode, name), name
    assert "fancy_upsampling" in inspect.signature(decode.decode_jpeg).parameters


def test_resize_surface():
    from pixo_tpu import resize as rz

    assert hasattr(rz, "resize") and hasattr(rz, "resize_into")


def test_parallel_surface():
    from pixo_tpu import parallel

    for name in ["make_mesh", "batch_sharding", "jpeg_coeffs_sharded",
                 "encode_jpeg_batch_sharded", "encode_jpeg_stream",
                 "encode_png_batch_sharded", "decode_jpeg_batch",
                 "decode_png_batch", "thumbnail_pipeline"]:
        assert hasattr(parallel, name), name


def test_bindings_surface():
    from pixo_tpu import bindings

    for name in ["encode_png", "encode_jpeg", "resize_image", "bytes_per_pixel"]:
        assert hasattr(bindings, name), name


def test_errors_taxonomy():
    from pixo_tpu import errors

    for name in ["PixoError", "InvalidDimensions", "InvalidDataLength",
                 "InvalidQuality", "InvalidCompressionLevel",
                 "UnsupportedColorType", "CompressionError",
                 "InvalidRestartInterval", "ImageTooLarge",
                 "InvalidDecode", "UnsupportedDecode"]:
        assert hasattr(errors, name), name
        if name != "PixoError":
            assert issubclass(getattr(errors, name), errors.PixoError)


def test_options_defaults_match_reference():
    from pixo_tpu import ColorType, FilterStrategy, JpegOptions, PngOptions, Subsampling

    j = JpegOptions()
    assert (j.quality, j.subsampling, j.color_type) == (
        75, Subsampling.S444, ColorType.RGB)
    assert not (j.optimize_huffman or j.progressive or j.trellis_quant)
    assert j.restart_interval is None
    p = PngOptions()
    assert (p.compression_level, p.filter_strategy, p.color_type) == (
        2, FilterStrategy.ADAPTIVE_FAST, ColorType.RGBA)
