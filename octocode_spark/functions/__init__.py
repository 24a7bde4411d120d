from octocode_spark.functions.zorder import (  # noqa: F401
    hilbert_index3,
    morton_interleave3,
    with_cluster_key,
)
from octocode_spark.functions.digest import table_digest, row_hash_col  # noqa: F401
