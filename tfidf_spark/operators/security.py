"""Row-level security as a relational operator (SURVEY.md §2.2 P3).

The reference enforces ownership imperatively per request —
``document.user_id != user.id -> 403`` (reference
app/controllers/document.py:232-233,371-375,444-447) — one row at a time
inside the controller. The engine-shaped equivalent is a POLICY JOIN:
the set of (principal, scope-key) grants is data, and a secured view of
a table is a semi-join against the grants of the querying principal,
applied BEFORE any other operator so nothing downstream ever sees an
unauthorized row.

Scale shape: grants are small relative to facts (principals x scopes),
so the semi-join broadcasts — zero shuffle of the fact table, and the
policy predicate participates in pushdown/pruning like any filter.
Column-level masking composes on top as a projection.

Authn (JWT parsing, password hashing — reference app/services/auth.py)
stays out of engine scope; this module is the authz DATA PLANE the
reference buries in controllers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def apply_row_policy(
    facts: DataFrame,
    grants: DataFrame,
    principal: str,
    scope_col: str,
    principal_col: str = "principal",
    grant_scope_col: str = "scope",
) -> DataFrame:
    """Rows of ``facts`` whose ``scope_col`` the ``principal`` holds a
    grant for: facts LEFT SEMI broadcast-join grants(principal). The
    result is a secured view — compose any query on top of it."""
    mine = grants.filter(F.col(principal_col) == principal).select(
        F.col(grant_scope_col).alias(scope_col)
    )
    return facts.join(F.broadcast(mine), scope_col, "left_semi")


def mask_columns(
    df: DataFrame, masked: dict[str, Column | None]
) -> DataFrame:
    """Column-level policy: replace each column in ``masked`` with the
    given expression (None -> drop). Runs as a plain projection."""
    out = df
    for col, repl in masked.items():
        out = out.drop(col) if repl is None else out.withColumn(col, repl)
    return out
