"""Directed triad census — the full Holland-Leinhardt 16-class count.

Extends the reference's ``algorithms/triads.py`` (which stops at
``is_triad``, a single-graph predicate — see ``is_triad`` in
operators/structure.py) to nx's ``triadic_census``: how many of the
C(n,3) node triples induce each of the 16 directed-triad isomorphism
classes (003, 012, 102, 021D/U/C, 111D/U, 030T/C, 201, 120D/U/C, 210,
300).

Distributed shape (the Batagelj-Mrvar decomposition, "A subquadratic
triad census algorithm for large sparse networks", Social Networks
23(3), 2001): only triples with >= 2 linked pairs are ever enumerated —
they are exactly the *wedges* of the undirected support graph (center
c, endpoints x < z), one self-join of the oriented linked-pair table on
the center.  Triangles (3 linked pairs) appear at all three centers, so
they are kept only at their minimum-id center; 2-path triples are kept
at their unique center.  The two one-pair classes (012 from each
asymmetric pair, 102 from each mutual pair) are pure arithmetic per
linked pair: ``n - d(u) - d(v) + common(u, v)`` third nodes are
adjacent to neither endpoint.  The ``common`` term never needs its own
pass over the wedge table (r5): a common neighbor of a LINKED pair
closes a support triangle, so summed over linked pairs it is a
triangle-census identity — each enumerated triangle class contributes
``count x (#asym pairs in class)`` to the 012 correction and
``count x (#mutual pairs in class)`` to 102 (030T/C: 3 asym; 120D/U/C:
1 mutual + 2 asym; 210: 2 mutual + 1 asym; 300: 3 mutual).  Replacing
the former ``wedges.groupBy(x, z)`` with this arithmetic deletes a
second full shuffle of the Σ C(d,2)-row wedge table (and the cache that
fed it) — the wedge stream is consumed exactly once.  003 is the
complement of everything else against C(n,3).

Wedge enumeration is the same sum-of-d(v)^2 cost family as triangle
counting (operators/triangles.py) — hubs dominate; the wedge join keys
on the center node so AQE's skew split applies, and no stage ever
materializes a triple that has fewer than 2 edges.

Classification is a 6-bit edge code over the id-sorted triple (a<b<c):
``32*ab + 16*ba + 8*ac + 4*ca + 2*bc + 1*cb`` looked up in a 64-entry
name table (CODE_NAME below, generated once from networkx's own
``triadic_census`` on all 64 single-triad graphs — provenance in
tests/test_triads.py, which regenerates and compares it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: code -> triad class name, code = 32*ab+16*ba+8*ac+4*ca+2*bc+1*cb over
#: the id-sorted triple (a < b < c).  Generated from networkx (see module
#: docstring); regenerated + asserted identical in tests/test_triads.py.
CODE_NAME: tuple[str, ...] = (
    "003", "012", "012", "102", "012", "021D", "021C", "111U",
    "012", "021C", "021U", "111D", "102", "111U", "111D", "201",
    "012", "021C", "021D", "111U", "021U", "030T", "030T", "120U",
    "021C", "030C", "030T", "120C", "111D", "120C", "120D", "210",
    "012", "021U", "021C", "111D", "021C", "030T", "030C", "120C",
    "021D", "030T", "030T", "120D", "111U", "120U", "120C", "210",
    "102", "111D", "111U", "201", "111D", "120D", "120C", "210",
    "111U", "120C", "120U", "210", "201", "210", "210", "300",
)

TRIAD_TYPES: tuple[str, ...] = (
    "003", "012", "102", "021D", "021U", "021C", "111D", "111U",
    "030T", "030C", "201", "120D", "120U", "120C", "210", "300",
)


def _linked_pairs(edges: DataFrame) -> DataFrame:
    """(u, v, f, b) with u < v: f=1 iff u->v exists, b=1 iff v->u."""
    return (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            F.when(F.col("src") < F.col("dst"), 1).otherwise(0).alias("_f"),
            F.when(F.col("src") > F.col("dst"), 1).otherwise(0).alias("_b"),
        )
        .groupBy("u", "v")
        .agg(F.max("_f").alias("f"), F.max("_b").alias("b"))
    )


def triadic_census(G, max_wedges: int | None = 2_000_000_000) -> DataFrame:
    """(triad_type: string, n: long) — all 16 rows, including the
    complement classes (012/102 arithmetic, 003 = C(n,3) minus the
    rest).  Requires C(n,3) < 2^63 (n <= ~3.8M) for the 003 row —
    beyond that the null-triad count is not a meaningful statistic
    anyway; pass the enumerated classes around it.

    ``max_wedges`` is the pre-flight go/no-go a 1000-executor run needs:
    the center join materializes exactly sum_c C(d_c, 2) rows (d_c =
    linked-pair degree), which is priced from ONE degree aggregate
    BEFORE any wedge is built; above the cap the call refuses with the
    estimate in the message (same pricing pass butterfly_count runs,
    bipartite.py:37).  ``None`` disables the gate."""
    n = G.n
    c_n3 = n * (n - 1) * (n - 2) // 6
    if c_n3 >= 2**63:
        raise ValueError(
            f"C(n,3) = {c_n3} overflows int64 at n={n}; the 003/012/102 "
            "complement classes are not representable — census the "
            "enumerated classes directly instead"
        )
    spark = G.spark
    lp = _linked_pairs(G.get_property("offdiag").select("src", "dst")).persist()

    if max_wedges is not None:
        budget = (
            lp.select(F.col("u").alias("id"))
            .unionByName(lp.select(F.col("v").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("d"))
            .agg(F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w"))
            .collect()[0]["w"]
        )
        budget = int(budget or 0)
        if budget > max_wedges:
            lp.unpersist()
            raise ValueError(
                f"triadic_census would materialize ~{budget:,} wedge rows "
                f"(> max_wedges={max_wedges:,}).  On hub-heavy graphs this "
                "is the intrinsic Batagelj-Mrvar cost; either raise "
                "max_wedges deliberately, or census a hub-capped subgraph."
            )

    # oriented view: (a, b, ab, ba) for both directions of each pair
    lpo = lp.select(
        F.col("u").alias("a"), F.col("v").alias("b"), F.col("f").alias("ab"),
        F.col("b").alias("ba"),
    ).unionByName(
        lp.select(
            F.col("v").alias("a"), F.col("u").alias("b"), F.col("b").alias("ab"),
            F.col("f").alias("ba"),
        )
    )

    # wedges: center c, endpoints x < z, with both pair orientations.
    # NOT persisted: the stream has exactly one consumer (the third-pair
    # join below) — the 012/102 common-neighbor correction that used to
    # re-aggregate this table is pure arithmetic on the enumerated
    # census (module docstring, r5).
    e1 = lpo.select(
        F.col("a").alias("c"), F.col("b").alias("x"),
        F.col("ab").alias("f_cx"), F.col("ba").alias("f_xc"),
    )
    e2 = lpo.select(
        F.col("a").alias("c"), F.col("b").alias("z"),
        F.col("ab").alias("f_cz"), F.col("ba").alias("f_zc"),
    )
    wedges = e1.join(e2, "c").filter(F.col("x") < F.col("z"))

    # third pair (x, z) if linked; triangles kept only at their min center
    third = lp.select(
        F.col("u").alias("x"), F.col("v").alias("z"),
        F.col("f").alias("f_xz"), F.col("b").alias("f_zx"),
    )
    trip = wedges.join(third, ["x", "z"], "left").filter(
        F.col("f_xz").isNull() | (F.col("c") < F.col("x"))
    )

    xz = F.coalesce("f_xz", F.lit(0))
    zx = F.coalesce("f_zx", F.lit(0))
    c, x, z = F.col("c"), F.col("x"), F.col("z")
    # id-sort {c, x, z} (x < z always) and permute the 6 bits to match
    code = (
        F.when(
            c < x,  # c < x < z
            32 * F.col("f_cx") + 16 * F.col("f_xc")
            + 8 * F.col("f_cz") + 4 * F.col("f_zc") + 2 * xz + zx,
        )
        .when(
            c < z,  # x < c < z
            32 * F.col("f_xc") + 16 * F.col("f_cx")
            + 8 * xz + 4 * zx + 2 * F.col("f_cz") + F.col("f_zc"),
        )
        .otherwise(  # x < z < c
            32 * xz + 16 * zx
            + 8 * F.col("f_xc") + 4 * F.col("f_cx")
            + 2 * F.col("f_zc") + F.col("f_cz"),
        )
    )
    name = F.element_at(
        F.array(*[F.lit(s) for s in CODE_NAME]), code.cast("int") + 1
    )
    enumerated = dict(
        trip.select(name.alias("triad_type"))
        .groupBy("triad_type")
        .agg(F.count("*").alias("n"))
        .collect()
    )

    # one-pair classes: per linked pair, # nodes adjacent to neither end
    # = n - d(u) - d(v) + common(u, v).  The degree part is one tiny agg
    # over the linked-pair table; the common part is the triangle-census
    # arithmetic (module docstring) — no wedge re-aggregation.
    deg = lpo.groupBy(F.col("a").alias("id")).agg(F.count("*").alias("d"))
    lonely = dict(
        lp.join(deg.select(F.col("id").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("d").alias("dv")), "v")
        .select(
            F.when((F.col("f") == 1) & (F.col("b") == 1), F.lit("102"))
            .otherwise(F.lit("012"))
            .alias("triad_type"),
            (F.lit(n) - F.col("du") - F.col("dv")).alias("_w"),
        )
        .groupBy("triad_type")
        .agg(F.sum("_w").alias("n"))
        .collect()
    )
    lp.unpersist()

    e = lambda t: int(enumerated.get(t, 0))
    tri_120 = e("120D") + e("120U") + e("120C")
    # Σ common(u,v) over asymmetric / mutual linked pairs
    common_asym = 3 * (e("030T") + e("030C")) + 2 * tri_120 + e("210")
    common_mut = tri_120 + 2 * e("210") + 3 * e("300")
    counts = dict(enumerated)
    counts["012"] = int(lonely.get("012", 0)) + common_asym
    counts["102"] = int(lonely.get("102", 0)) + common_mut
    counts["003"] = int(c_n3 - sum(counts.values()))
    rows = [(t, int(counts.get(t, 0))) for t in TRIAD_TYPES]
    return spark.createDataFrame(rows, "triad_type string, n long")
