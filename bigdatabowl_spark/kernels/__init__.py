from bigdatabowl_spark.kernels.params import EppaParams, FIELD_X, FIELD_Y, N_CELLS, N_TOF  # noqa: F401
