"""Shared scalar expressions for the DBLP query family.

These are the two sub-operators the reference duplicates across its
mappers (SURVEY.md §2.1 "shared sub-operators"), expressed once as
Catalyst column expressions so they stay inside whole-stage codegen —
no Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NO_VENUE = "No venue available"


def _nonempty(c: Column) -> Column:
    """NULL-out empty strings so coalesce() can fall through, mirroring
    the reference's `if (x.text == "") fallback` checks."""
    return F.nullif(F.coalesce(c, F.lit("")), F.lit(""))


def venue_expr(
    kind: Column | str = "kind",
    journal: Column | str = "journal",
    booktitle: Column | str = "booktitle",
    publisher: Column | str = "publisher",
    school: Column | str = "school",
    key: Column | str = "key",
) -> Column:
    """Venue derivation — the 6-arm dispatch duplicated in three mappers
    of the reference (Homework2.scala:42-51, :239-248, :296-305):

      article                  -> journal, else booktitle
      inproceedings|incollection -> booktitle
      book|proceedings         -> publisher, else booktitle
      phdthesis|mastersthesis  -> school
      www                      -> first 3 '/'-segments of the key
                                  (Homework2.scala:49)
      otherwise                -> "No venue available" (Homework2.scala:50)

    Missing branches yield '' (the reference emits the empty string and
    filters it downstream, Homework2.scala:136).
    """
    kind = F.col(kind) if isinstance(kind, str) else kind
    journal = F.col(journal) if isinstance(journal, str) else journal
    booktitle = F.col(booktitle) if isinstance(booktitle, str) else booktitle
    publisher = F.col(publisher) if isinstance(publisher, str) else publisher
    school = F.col(school) if isinstance(school, str) else school
    key = F.col(key) if isinstance(key, str) else key

    www_venue = F.concat_ws("/", F.slice(F.split(key, "/"), 1, 3))
    return (
        F.when(kind == "article", F.coalesce(_nonempty(journal), _nonempty(booktitle)))
        .when(kind.isin("inproceedings", "incollection"), _nonempty(booktitle))
        .when(
            kind.isin("book", "proceedings"),
            F.coalesce(_nonempty(publisher), _nonempty(booktitle)),
        )
        .when(kind.isin("phdthesis", "mastersthesis"), _nonempty(school))
        .when(kind == "www", www_venue)
        .otherwise(F.lit(NO_VENUE))
    )


def authors_or_editors(
    authors: Column | str = "authors", editors: Column | str = "editors"
) -> Column:
    """Author/editor coalesce (Homework2.scala:53-57, repeated at six
    sites): the author list, falling back to editors when empty.
    Returns array<string>; empty array when both are absent."""
    authors = F.col(authors) if isinstance(authors, str) else authors
    editors = F.col(editors) if isinstance(editors, str) else editors
    a = F.coalesce(authors, F.array().cast("array<string>"))
    e = F.coalesce(editors, F.array().cast("array<string>"))
    return F.when(F.size(a) > 0, a).otherwise(e)
