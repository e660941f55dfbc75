"""Deterministic synthesizer of the source-code repository table.

BASELINE.json input_hint: an Iceberg-style table
``(repo: string, path: string, commit: string, lang: string,
content: string)`` from which the link graph is derived — edges are
import/dependency relations embedded in ``content`` (the ground truth is
IN the text, so extraction is verifiable; FIXTURES.md F1).

Scale-first design: rows are generated ENTIRELY with Spark column
expressions over ``spark.range`` — no driver-side python loops, no
wall-clock, no RNG state.  All pseudo-randomness is ``xxhash64`` of the
file id with a salt, so the table is a pure deterministic function of
(n_repos, files_per_repo, seed) and generation parallelizes to any
cluster size (the 10^12-file corpus story: same expressions, bigger
range).

Skew: import fan-in follows a Zipf-like law — every file's k-th import
targets ``floor(u^alpha * n_files)`` for a hash-uniform u, concentrating
references on low file ids; additionally a configurable fraction of
files import file 0 directly, making it a hub with >=5% of all edges
(FIXTURES.md skew requirement).

Per-row invariant: ``sha2(content, 256)`` — checked for determinism in
tests and recorded as the ``expected_sha`` fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["py", "js", "go", "java"]
_EXT = {"py": "py", "js": "js", "go": "go", "java": "java"}

# one canonical import syntax per language (the regexes in edges.py are
# the inverse of these templates)
_IMPORT_FMT = {
    "py": ("import ", ""),
    "js": ("const m = require('", "');"),
    "go": ('import "', '"'),
    "java": ("import ", ";"),
}


def _h(col, salt: str, seed: int):
    """Deterministic 64-bit hash stream: xxhash64(id, salt, seed)."""
    return F.xxhash64(col, F.lit(salt), F.lit(seed))


def _uniform(col, salt: str, seed: int):
    """Hash-uniform double in [0, 1)."""
    return (F.pmod(_h(col, salt, seed), F.lit(1_000_000_007)).cast("double")) / F.lit(
        1_000_000_007.0
    )


def synthesize_source_table(
    spark: SparkSession,
    n_repos: int = 100,
    files_per_repo: int = 50,
    seed: int = 42,
    max_imports: int = 20,
    deg_exponent: float = -0.6,
    zipf_alpha: float = 3.0,
    hub_prob: float = 0.15,
    n_commits_per_repo: int = 3,
    num_partitions: int | None = None,
) -> DataFrame:
    """Returns (repo, path, commit, lang, content, module) — ``module`` is
    the canonical dotted key ``repoNNNN.mJJJ`` (kept as a convenience
    column; the five input_hint columns are the contract).
    """
    n_files = n_repos * files_per_repo
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    df = spark.range(0, n_files, 1, num_partitions).withColumnRenamed("id", "fid")

    repo_idx = (F.col("fid") / files_per_repo).cast("long")
    file_idx = F.pmod(F.col("fid"), F.lit(files_per_repo))
    repo = F.format_string("repo%04d", repo_idx)
    module_local = F.format_string("m%03d", file_idx)
    module = F.concat(repo, F.lit("."), module_local)

    # lang: weighted 0.5/0.2/0.2/0.1 (FIXTURES.md F1)
    lang_bucket = F.pmod(_h(F.col("fid"), "lang", seed), F.lit(10))
    lang = (
        F.when(lang_bucket < 5, "py")
        .when(lang_bucket < 7, "js")
        .when(lang_bucket < 9, "go")
        .otherwise("java")
    )

    # commit: hex sha256 of "repo:k" truncated to 40 (FIXTURES.md F1)
    commit_k = F.pmod(_h(F.col("fid"), "commit", seed), F.lit(n_commits_per_repo))
    commit = F.substring(
        F.sha2(F.concat(repo, F.lit(":"), commit_k.cast("string")), 256), 1, 40
    )

    # --- import targets --------------------------------------------------
    # out-degree 1..max_imports, Zipf-ish via inverse-power of a hash-uniform;
    # deg_exponent controls the mean (~1/(1+deg_exponent) before the cap) —
    # bench scaling runs raise it to make per-superstep compute dominate
    u_deg = _uniform(F.col("fid"), "deg", seed)
    # cap with least() BEFORE the int cast: steep exponents make
    # floor(u^e) overflow int for hash-uniforms near 0
    out_deg = F.least(
        F.lit(max_imports).cast("long"),
        F.greatest(F.lit(1).cast("long"), F.floor(F.pow(u_deg, F.lit(deg_exponent)))),
    ).cast("int")
    # k-th import target: skewed toward low fids (power-law fan-in);
    # with prob hub_prob the first import is file 0 (the hub)
    ks = F.sequence(F.lit(0), out_deg - 1)

    def target_expr(k):
        u = _uniform(F.col("fid") * F.lit(131) + k, "tgt", seed)
        skewed = F.floor(F.pow(u, F.lit(zipf_alpha)) * F.lit(n_files)).cast("long")
        hub_u = _uniform(F.col("fid"), "hub", seed)
        return F.when((k == 0) & (hub_u < F.lit(hub_prob)), F.lit(0)).otherwise(skewed)

    targets = F.transform(ks, target_expr)
    # drop self-imports, dedupe
    targets = F.array_distinct(
        F.filter(targets, lambda t: t != F.col("fid"))
    )

    # target module key from target fid (same arithmetic as above)
    def tgt_module(t):
        return F.format_string(
            "repo%04d.m%03d",
            (t / files_per_repo).cast("long"),
            F.pmod(t, F.lit(files_per_repo)),
        )

    tgt_modules = F.transform(targets, tgt_module)

    # --- content ----------------------------------------------------------
    # header + per-lang import lines + deterministic filler
    def import_lines(lang_name):
        pre, post = _IMPORT_FMT[lang_name]
        if lang_name in ("js", "go"):
            # slash-separated module path for js/go
            mods = F.transform(
                tgt_modules, lambda m: F.replace(m, F.lit("."), F.lit("/"))
            )
        else:
            mods = tgt_modules
        return F.array_join(
            F.transform(mods, lambda m: F.concat(F.lit(pre), m, F.lit(post))), "\n"
        )

    imports_block = (
        F.when(lang == "py", import_lines("py"))
        .when(lang == "js", import_lines("js"))
        .when(lang == "go", import_lines("go"))
        .otherwise(import_lines("java"))
    )
    filler = F.concat(
        F.lit("\n\ndef f_"),
        F.col("fid").cast("string"),
        F.lit("():\n    return "),
        F.pmod(_h(F.col("fid"), "filler", seed), F.lit(9973)).cast("string"),
        F.lit("\n"),
    )
    content = F.concat(
        F.lit("// module "), module, F.lit(" lang="), lang, F.lit("\n"),
        imports_block, filler,
    )

    path = F.concat(F.lit("src/"), module_local, F.lit("."),
                    F.element_at(F.create_map(
                        *[x for kv in [(F.lit(k), F.lit(v)) for k, v in _EXT.items()] for x in kv]
                    ), lang))

    return df.select(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
        module.alias("module"),
    )


def expected_sha(source: DataFrame) -> DataFrame:
    """Per-row invariant table (repo, path, commit, sha256) —
    BASELINE.json:15 content sha256 equality."""
    return source.select(
        "repo", "path", "commit", F.sha2(F.col("content"), 256).alias("sha256")
    )
