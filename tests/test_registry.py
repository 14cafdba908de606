"""Registry tripwires: the driver contract is exactly EXPECTED keys
(SURVEY.md §2.2 through tier 23), each
with a callable, every oracle keyed by a registered query. Guards
against silent shrinkage (a failed tier import used to drop its keys
without a sound — see queries/__init__.py's import policy)."""

import subprocess
import sys

from etl_tool_rep_spark.queries import ORACLES, QUERIES

EXPECTED = 325


def test_registry_counts():
    assert len(QUERIES) == EXPECTED
    assert len(set(QUERIES)) == EXPECTED
    assert all(callable(f) for f in QUERIES.values())


def test_every_oracle_key_is_registered():
    assert set(ORACLES) <= set(QUERIES)
    assert all(isinstance(s, str) and s.strip()
               for s in ORACLES.values())


def test_entry_module_exposes_full_registry():
    import __spark_entry__
    assert set(__spark_entry__.queries()) == set(QUERIES)
    assert set(__spark_entry__.oracle_sql()) == set(ORACLES)


def test_broken_tier_import_fails_loudly():
    """A typo'd import inside any tier module must raise at package
    import, not silently drop the tier's keys from the registry."""
    code = (
        "import sys\n"
        "class Boom:\n"
        "    def find_spec(self, name, path=None, target=None):\n"
        "        if name == 'etl_tool_rep_spark.queries.tier13':\n"
        "            raise ImportError('injected')\n"
        "        return None\n"
        "sys.meta_path.insert(0, Boom())\n"
        "try:\n"
        "    import etl_tool_rep_spark.queries\n"
        "except ImportError:\n"
        "    print('RAISED')\n"
        "else:\n"
        "    print('SWALLOWED', len(etl_tool_rep_spark.queries.QUERIES))\n"
    )
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, cwd="/root/repo")
    assert "RAISED" in out.stdout, out.stdout + out.stderr
