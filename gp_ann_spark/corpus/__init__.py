from gp_ann_spark.corpus.generator import generate_repos  # noqa: F401
from gp_ann_spark.corpus.ingest import (  # noqa: F401
    dedup_files,
    dense_ids,
    featurize,
    repos_to_points,
)
