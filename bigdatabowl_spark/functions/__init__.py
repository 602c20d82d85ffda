from bigdatabowl_spark.functions.scalar import (  # noqa: F401
    clip,
    dec,
    dec_avg,
    dec_sum,
    sigmoid,
    angle_wrap_deg,
    kinematic_pos,
)
