"""pydala2_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of `legout/pydala2` (see /root/reference),
re-designed Spark-first.

Where pydala2 orchestrates PyArrow + DuckDB + Polars in one process,
this engine expresses every operator as a Spark DataFrame/SQL plan so
Catalyst handles pushdown, pruning, join selection, and AQE handles
runtime re-planning — the same API surface, but one that scales from
a laptop to a 1000-executor cluster.

Public surface:
    from pydala2_spark import Dataset, ParquetDataset, CSVDataset, JSONDataset
    from pydala2_spark import Catalog, Writer, merge
    from pydala2_spark.session import get_spark
"""

from pydala2_spark.errors import PartialMergeError, PartialWriteError
from pydala2_spark.session import get_spark
from pydala2_spark.sources.dataset import (
    AvroDataset,
    BaseDataset,
    CSVDataset,
    Dataset,
    JSONDataset,
    ORCDataset,
    ParquetDataset,
)
from pydala2_spark.sources.writer import Writer
from pydala2_spark.operators.asof import asof_join
from pydala2_spark.operators.merge import (
    MergeResult,
    delete_where,
    merge,
    merge_frames,
    merge_scd2,
    scd2_frames,
)
from pydala2_spark.plans.bloom import (
    bloom_prune,
    build_bloom_index,
    read_bloom_pruned,
    refresh_bloom_index,
)
from pydala2_spark.plans.cachefs import LocalCache
from pydala2_spark.plans.catalog import Catalog
from pydala2_spark.operators.classify import logreg_fit, logreg_score
from pydala2_spark.operators.similarity import (
    pca_fit,
    pca_project,
    pq_encode,
    pq_topk,
    pq_train,
)
from pydala2_spark.plans.snapshots import (
    SnapshotDataset,
    UnsafeCommitError,
    s3_conditional_put_publisher,
)
from pydala2_spark.plans.analyze import analyze_dataset
from pydala2_spark.plans.stats import (
    StatsIndex,
    build_ndv_sketches,
    estimate_ndv,
    export_legacy_file_metadata,
    import_legacy_file_metadata,
    refresh_ndv_sketches,
    register_scheme_filesystem,
    unregister_scheme_filesystem,
)
from pydala2_spark.operators.dedup import semantic_dedup
from pydala2_spark.operators.curate import train_test_split, unigram_logprob_scores
from pydala2_spark.operators.multimodal import (
    audio_pcm_stats,
    decode_gif_pixels,
    decode_image_pixels,
    decode_png_pixels,
    decode_wav_samples,
    encode_bmp,
    encode_gif,
    encode_png,
    encode_wav_pcm16,
    image_pixel_stats,
    parse_mp4_header,
    parse_webp_header,
)
from pydala2_spark.operators.jpeg import decode_jpeg_pixels, encode_jpeg
from pydala2_spark.streaming.pipeline import curate_stream

__all__ = [
    "get_spark",
    "BaseDataset",
    "Dataset",
    "ParquetDataset",
    "CSVDataset",
    "JSONDataset",
    "ORCDataset",
    "AvroDataset",
    "Writer",
    "merge",
    "delete_where",
    "merge_frames",
    "MergeResult",
    "PartialWriteError",
    "PartialMergeError",
    "Catalog",
    "LocalCache",
    "StatsIndex",
    "asof_join",
    "merge_scd2",
    "scd2_frames",
    "SnapshotDataset",
    "build_bloom_index",
    "bloom_prune",
    "read_bloom_pruned",
    "build_ndv_sketches",
    "estimate_ndv",
    "refresh_bloom_index",
    "refresh_ndv_sketches",
    "pca_fit",
    "pca_project",
    "pq_train",
    "pq_encode",
    "pq_topk",
    "logreg_fit",
    "logreg_score",
    "analyze_dataset",
    "export_legacy_file_metadata",
    "import_legacy_file_metadata",
    "semantic_dedup",
    "train_test_split",
    "unigram_logprob_scores",
    "curate_stream",
    "UnsafeCommitError",
    "s3_conditional_put_publisher",
    "register_scheme_filesystem",
    "unregister_scheme_filesystem",
    "image_pixel_stats",
    "audio_pcm_stats",
    "decode_image_pixels",
    "decode_png_pixels",
    "decode_gif_pixels",
    "encode_bmp",
    "encode_png",
    "encode_gif",
    "decode_wav_samples",
    "encode_wav_pcm16",
    "decode_jpeg_pixels",
    "encode_jpeg",
    "parse_mp4_header",
    "parse_webp_header",
]

__version__ = "0.1.0"
