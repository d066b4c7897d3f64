"""Per-chunk error tolerance on DB-API sinks (reference models.py:376-385,
SURVEY §7 hard part 3)."""

import functools
import sqlite3

import pytest

from pydin_spark import ErrorLimitExceeded, Pipeline, Select, Table


@pytest.fixture
def sqlite_db(tmp_path):
    db = str(tmp_path / "budget.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE tgt (k INTEGER CHECK (k >= 0), name TEXT)")
    con.commit()
    con.close()
    return db


POISONED = ("SELECT CASE WHEN n_nationkey = 3 THEN -1 ELSE n_nationkey END "
            "AS k, n_name AS name FROM nation")


def _sink(db, **kw):
    return Table(table_name="tgt", paramstyle="qmark",
                 connection_factory=functools.partial(sqlite3.connect, db),
                 chunk_size=1, num_partitions=1, **kw)


def test_error_budget_tolerates_failed_chunks(spark, views, sqlite_db):
    p = Pipeline(Select(text=POISONED), _sink(sqlite_db),
                 spark=spark, error_limit=10).run()
    assert p.records_error == 1
    con = sqlite3.connect(sqlite_db)
    assert con.execute("SELECT COUNT(*) FROM tgt").fetchone()[0] == 24
    assert con.execute("SELECT COUNT(*) FROM tgt WHERE k < 0") \
        .fetchone()[0] == 0


def test_error_budget_aborts_at_limit(spark, views, sqlite_db):
    with pytest.raises(ErrorLimitExceeded):
        Pipeline(Select(text=POISONED), _sink(sqlite_db),
                 spark=spark, error_limit=1).run()


def test_error_budget_clean_load_counts(spark, views, sqlite_db):
    p = Pipeline(Select(text="SELECT n_nationkey AS k, n_name AS name "
                             "FROM nation"),
                 _sink(sqlite_db), spark=spark, error_limit=1).run()
    assert p.records_error == 0
    assert p.records_written == 25
    con = sqlite3.connect(sqlite_db)
    assert con.execute("SELECT COUNT(*) FROM tgt").fetchone()[0] == 25
