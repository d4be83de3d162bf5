"""Deterministic synthetic source-code corpus (the BASELINE.json input_hint).

Schema (exactly the input_hint): ``(repo:string, path:string,
commit:string, lang:string, content:string)``. Everything is a pure
function of ``(spec, repo_index, file_index)`` via blake2b hashing — two
generations at any parallelism produce byte-identical rows, which is what
lets the per-row ``sha256(content)`` invariant be checked end-to-end.

Shape of the data (mirrors what a real repo corpus looks like, and what
the reference's converter had to cope with — self loops, duplicate
edges, dangling references; cf. /root/reference/tools/graph_converter/
graph_converter.cpp:61-170):

* repo sizes are Zipf-ish (``(r+1)**-0.8``) so a few repos are huge —
  out-degree skew for the partitioner;
* each file imports: ~80% sibling files in the same repo (guaranteed to
  exist), ~10% "stdlib" modules drawn from a pool of 24 names (imported
  by a large fraction of all files -> extreme in-degree hubs), ~5% other
  repos (cross-repo edges), ~5% nonexistent modules (must be dropped by
  resolution);
* import *syntax* differs per language (py/js/java/go/rs) so ingest has
  to do real per-language regex extraction.

At 10^12-file scale the generator parallelises over repos with
``ray.data.range(num_repos).map_batches(...)``; per-repo file counts come
from the closed-form size law, so no global state is shipped anywhere.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from .util import h64, write_json_atomic

LANGS = ["py", "js", "java", "go", "rs"]
EXT = {"py": "py", "js": "js", "java": "java", "go": "go", "rs": "rs"}
STDLIB = [f"std_{n}" for n in (
    "os sys io net time json math fmt log re str vec map collections http "
    "crypto rand test fs path proc env thread sync".split()
)]
assert len(STDLIB) == 24

# per-language import statement templates; {m} = module token with
# language-appropriate separators
IMPORT_TMPL = {
    "py": "import {m}",
    "js": "const m{i} = require('{m}');",
    "java": "import {m};",
    "go": "import \"{m}\"",
    "rs": "use {m};",
}
SEP = {"py": ".", "js": "/", "java": ".", "go": "/", "rs": "::"}


@dataclass(frozen=True)
class CorpusSpec:
    name: str
    num_repos: int
    files_target: int
    seed: int = 42

    @property
    def tag(self) -> str:
        return f"{self.name}-r{self.num_repos}-f{self.files_target}-s{self.seed}"


TINY = CorpusSpec("tiny", 8, 200)
SMALL = CorpusSpec("small", 64, 5_000)
BENCH = CorpusSpec("bench", 512, 100_000)
BENCH4 = CorpusSpec("bench4", 1024, 400_000)


def repo_sizes(spec: CorpusSpec) -> np.ndarray:
    """File count per repo: Zipf-ish, deterministic, sum ~= files_target."""
    r = np.arange(spec.num_repos, dtype=np.float64)
    raw = (r + 1.0) ** -0.8
    sizes = np.maximum(3, (raw * (spec.files_target / raw.sum())).astype(np.int64))
    return sizes


def repo_name(spec: CorpusSpec, r: int) -> str:
    return f"org{r % max(1, spec.num_repos // 8)}/proj{r}"


def _num_pkgs(size: int) -> int:
    return max(1, int(np.sqrt(size) / 2) + 1)


def file_path(spec: CorpusSpec, r: int, j: int, size: int) -> tuple[str, str]:
    """(path, lang) of file j of repo r — closed form, no global state."""
    lang = LANGS[h64(spec.seed, "lang", r, j) % len(LANGS)]
    pkg = h64(spec.seed, "pkg", r, j) % _num_pkgs(size)
    return f"src/pkg_{pkg}/mod_{j}.{EXT[lang]}", lang


def _module_token(parts: list[str], lang: str) -> str:
    return SEP[lang].join(parts)


def gen_repo_table(spec: CorpusSpec, r: int, size: int) -> pa.Table:
    """All rows of one repo as an Arrow table (pure function)."""
    repo = repo_name(spec, r)
    commit = f"{h64(spec.seed, 'commit', r):016x}{h64(spec.seed, 'commit2', r):016x}"[:40].ljust(40, "0")
    repos_pool = max(1, spec.num_repos)

    paths, langs, contents = [], [], []
    for j in range(size):
        path, lang = file_path(spec, r, j, size)
        lines = [
            {"py": "#", "js": "//", "java": "//", "go": "//", "rs": "//"}[lang]
            + f" {repo}/{path} @ {commit[:12]}",
        ]
        n_imp = h64(spec.seed, "nimp", r, j) % 6
        for i in range(n_imp):
            roll = h64(spec.seed, "roll", r, j, i) % 100
            if roll < 80:  # sibling file in same repo (exists by construction)
                j2 = h64(spec.seed, "sib", r, j, i) % size
                p2, _lang2 = file_path(spec, r, j2, size)
                # module token from path: src/pkg_a/mod_b.ext -> [pkg_a, mod_b]
                segs = p2.split("/")
                mod = _module_token([segs[1], segs[2].rsplit(".", 1)[0]], lang)
            elif roll < 90:  # stdlib hub
                mod = STDLIB[h64(spec.seed, "std", r, j, i) % len(STDLIB)]
            elif roll < 95:  # cross-repo
                r2 = h64(spec.seed, "x", r, j, i) % repos_pool
                mod = f"ext__org{r2 % max(1, spec.num_repos // 8)}__proj{r2}"
            else:  # nonexistent — resolution must drop it
                mod = f"ghost_{h64(spec.seed, 'g', r, j, i) % 10_000}"
            lines.append(IMPORT_TMPL[lang].format(m=mod, i=i))
        # filler body, deterministic
        for k in range(2 + h64(spec.seed, "body", r, j) % 4):
            lines.append(f"def f_{j}_{k}(): pass  # {h64(spec.seed, 'fill', r, j, k) % 999983:06d}")
        paths.append(path)
        langs.append(lang)
        contents.append("\n".join(lines) + "\n")

    return pa.table(
        {
            "repo": pa.array([repo] * size, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array([commit] * size, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.large_string()),
        }
    )


def corpus_table(spec: CorpusSpec) -> pa.Table:
    """Whole corpus as one Arrow table — small specs only (tests/oracles)."""
    sizes = repo_sizes(spec)
    return pa.concat_tables(
        gen_repo_table(spec, r, int(sizes[r])) for r in range(spec.num_repos)
    )


class _GenRepos:
    """Actor-pool batch fn: repo-index batch -> corpus rows for those repos.

    Stateful so the (cheap) size-law array is computed once per actor, not
    once per batch — the pattern the reference amortises via its loader
    threads (/root/reference/core/components/loader_op2.h).
    """

    def __init__(self, spec: CorpusSpec):
        self.spec = spec
        self.sizes = repo_sizes(spec)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tabs = [
            gen_repo_table(self.spec, int(r), int(self.sizes[int(r)]))
            for r in batch["id"].to_numpy()
        ]
        return pa.concat_tables(tabs) if tabs else gen_repo_table(self.spec, 0, 0)


def corpus_dataset(spec: CorpusSpec, concurrency: int | None = None):
    """Corpus as a streaming ray.data.Dataset (parallel over repos)."""
    import ray.data as rd

    n = spec.num_repos
    ds = rd.range(n, override_num_blocks=min(n, 64))
    # autoscaling (1, N) pool: never deadlocks waiting for actors the
    # cluster cannot schedule (a fixed-size pool larger than the CPU
    # count would), still scales out on big sessions
    return ds.map_batches(
        _GenRepos,
        fn_constructor_args=(spec,),
        batch_format="pyarrow",
        batch_size=max(1, n // 64) or 1,
        concurrency=(1, concurrency or 8),
    )


def default_cache_dir() -> str:
    return os.environ.get("PLANAR_RAY_CACHE", "/tmp/planar_ray_cache")


def write_corpus(spec: CorpusSpec, out_root: str | None = None, use_ray: bool = True) -> str:
    """Idempotently materialise the corpus parquet; returns its directory.

    Layout: ``<root>/corpus/<tag>/*.parquet`` + ``_MANIFEST.json`` written
    last (the completion marker a resumed run checks).
    """
    import shutil

    out_root = out_root or default_cache_dir()
    out_dir = os.path.join(out_root, "corpus", spec.tag)
    marker = os.path.join(out_dir, "_MANIFEST.json")
    if os.path.exists(marker):
        return out_dir
    # stage into a tmp dir and rename LAST: a crash mid-write must not
    # leave partial parquet a re-run would append duplicate rows beside
    tmp_dir = out_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    if use_ray and spec.files_target > 20_000:
        ds = corpus_dataset(spec)
        ds.write_parquet(tmp_dir)
        num_rows = None  # counted lazily by readers if needed
    else:
        import pyarrow.parquet as pq

        tab = corpus_table(spec)
        pq.write_table(tab, os.path.join(tmp_dir, "corpus-0.parquet"))
        num_rows = tab.num_rows
    write_json_atomic(os.path.join(tmp_dir, "_MANIFEST.json"),
                      {"spec": spec.tag, "rows": num_rows})
    os.rename(tmp_dir, out_dir)  # commit marker
    return out_dir
