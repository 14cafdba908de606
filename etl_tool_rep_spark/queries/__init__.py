"""Declared query inventory (SURVEY.md §2.2 binding contract).

Importing this package populates the registry with every implemented
query. Each query is a ``(spark, sf_dir) -> DataFrame`` callable plus,
where SQL-expressible, a DuckDB oracle SQL string the driver
hash-matches at sf0.01.
"""

from .registry import ORACLES, QUERIES, query  # noqa: F401

# import for side effects: each module registers its queries
from . import tier0  # noqa: F401,E402

try:
    from . import tier1  # noqa: F401,E402
    from . import tier1b  # noqa: F401,E402
    from . import tier1c  # noqa: F401,E402
    from . import tier1d  # noqa: F401,E402
    from . import tier1e  # noqa: F401,E402
    from . import tpch_like  # noqa: F401,E402
    from . import tpch_like2  # noqa: F401,E402
    from . import tpch_like3  # noqa: F401,E402
    from . import tier6  # noqa: F401,E402
    from . import tier7  # noqa: F401,E402
    from . import tier8  # noqa: F401,E402
    from . import tier9  # noqa: F401,E402
    from . import tier10  # noqa: F401,E402
    from . import tier11  # noqa: F401,E402
    from . import tier12  # noqa: F401,E402
    from . import tier13  # noqa: F401,E402
except ImportError:
    pass
try:
    from . import tier2  # noqa: F401,E402
except ImportError:
    pass
try:
    from . import tier3  # noqa: F401,E402
    from . import tier3b  # noqa: F401,E402
    from . import tier3c  # noqa: F401,E402
    from . import tier4  # noqa: F401,E402
    from . import tier5  # noqa: F401,E402
except ImportError:
    pass
