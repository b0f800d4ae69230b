from gp_ann_spark.functions.distances import (  # noqa: F401
    inner_product_matrix,
    l2_normalize,
    mips_distance_matrix,
    pairwise_sqr_l2,
    pos_distance_matrix,
    sql_sqr_l2,
    vec_norm,
)
