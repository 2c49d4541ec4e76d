"""Doc-count tripwires (r11 verdict "What's wrong" #2: MIGRATION.md
shipped a stale registry count for two rounds). The prose files quote
the registry size; these tests pin every quoted count to
``load_registry()`` so a stale number goes red in the suite instead of
shipping. Adding registry entries therefore REQUIRES touching the two
sentences below — that is the point.
"""

import re
from pathlib import Path

from pandas_aws_spark.registry import load_registry

ROOT = Path(__file__).resolve().parents[1]


def _registry_size() -> int:
    return len(load_registry())


def test_migration_md_registry_count_is_current():
    text = (ROOT / "MIGRATION.md").read_text()
    m = re.search(r"\((\d+) oracle-checked entries", text)
    assert m, "MIGRATION.md lost its oracle-checked-entries sentence"
    assert int(m.group(1)) == _registry_size(), (
        f"MIGRATION.md quotes {m.group(1)} oracle-checked entries but "
        f"load_registry() holds {_registry_size()} — update the doc"
    )


def test_readme_registry_count_is_current():
    text = (ROOT / "README.md").read_text()
    m = re.search(r"\*\*(\d+) registered queries, (\d+) oracles", text)
    assert m, "README.md lost its registered-queries sentence"
    n = _registry_size()
    assert int(m.group(1)) == n and int(m.group(2)) == n, (
        f"README.md quotes {m.group(1)}/{m.group(2)} but load_registry() "
        f"holds {n} — update the doc"
    )
