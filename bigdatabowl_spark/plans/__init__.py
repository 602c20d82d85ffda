from bigdatabowl_spark.plans.catalog import CATALOG, CatalogQuery, register, query_fns, oracle_map  # noqa: F401

# Importing these modules populates CATALOG via @register.
from bigdatabowl_spark.plans import relational  # noqa: F401,E402
from bigdatabowl_spark.plans import scalar_queries  # noqa: F401,E402
from bigdatabowl_spark.plans import datapipe  # noqa: F401,E402
from bigdatabowl_spark.plans import advanced  # noqa: F401,E402
from bigdatabowl_spark.plans import tracking  # noqa: F401,E402
from bigdatabowl_spark.plans import gaps  # noqa: F401,E402
from bigdatabowl_spark.plans import sources_queries  # noqa: F401,E402
from bigdatabowl_spark.plans import eppa_queries  # noqa: F401,E402
from bigdatabowl_spark.plans import analytics  # noqa: F401,E402
from bigdatabowl_spark.plans import etl_queries  # noqa: F401,E402
from bigdatabowl_spark.plans import corpus  # noqa: F401,E402
from bigdatabowl_spark.plans import round4  # noqa: F401,E402
from bigdatabowl_spark.plans import round5  # noqa: F401,E402
from bigdatabowl_spark.plans import round6  # noqa: F401,E402
from bigdatabowl_spark.plans import round7  # noqa: F401,E402
from bigdatabowl_spark.streaming import events as _streaming_events  # noqa: F401,E402
