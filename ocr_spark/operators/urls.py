"""URL canonicalization + URL-level dedup — crawl-pipeline staples.

Common-Crawl corpora carry the same page under many URL spellings; URL
canonicalization collapses them before any content work. Semantics
(documented, pinned by tests and the fixture oracle):

- scheme and host lowercased; default ports (:80 http, :443 https) dropped;
- fragment removed; tracking parameters (utm_*, fbclid, gclid, msclkid,
  ref, mc_cid, mc_eid) removed;
- remaining query parameters SORTED by (key, value) for order-insensitive
  equality; empty query drops the '?';
- path '.'/'..' segments resolved, duplicate slashes collapsed (a POSIX
  leading '//' is preserved by normpath), and a bare-root '' path
  becomes '/'.

Pure stdlib urllib parsing inside an Arrow-batched mapInPandas (string in,
string out — one narrow python stage, no shuffle).
"""

from __future__ import annotations

import posixpath
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

from pyspark.sql import DataFrame, functions as F

_TRACKING = ("fbclid", "gclid", "msclkid", "ref", "mc_cid", "mc_eid")

# Embedded public-suffix snapshot (publicsuffix.org list format semantics:
# normal rules, `*.` wildcard rules, `!` exception rules). A deterministic
# REPRESENTATIVE subset — production swaps in the full PSL via the
# function parameters; the matching algorithm is the spec's, independent
# of list size. ICANN + common private (hosting) suffixes.
PSL_RULES_1 = (
    "com net org io dev app gov edu mil int info biz xyz online site "
    "de fr it nl es se no fi pl ru ua cz ch at be dk eu us ca mx jp cn "
    "in br au uk kr tr ar za"
).split()
PSL_RULES_2 = (
    "co.uk org.uk ac.uk gov.uk me.uk com.au net.au org.au co.jp ne.jp "
    "or.jp ac.jp com.br net.br org.br com.cn net.cn org.cn com.mx co.in "
    "firm.in co.kr com.tr co.za org.za com.ar github.io gitlab.io "
    "blogspot.com herokuapp.com netlify.app vercel.app pages.dev web.app"
).split()
PSL_RULES_3 = "ltd.co.im plc.co.im s3.amazonaws.com".split()
PSL_WILDCARD_BASES = "ck jm kw".split()  # e.g. rule `*.ck`
PSL_EXCEPTIONS = "www.ck www.jm".split()  # e.g. rule `!www.ck`


def registrable_domain(
    df: DataFrame,
    host_col: str = "host",
    *,
    rules1: list[str] = PSL_RULES_1,
    rules2: list[str] = PSL_RULES_2,
    rules3: list[str] = PSL_RULES_3,
    wildcard_bases: list[str] = PSL_WILDCARD_BASES,
    exceptions: list[str] = PSL_EXCEPTIONS,
) -> DataFrame:
    """Public-suffix (eTLD) and registrable domain (eTLD+1) per host —
    publicsuffix.org algorithm as PURE Column algebra: exception rules
    first, then longest explicit rule, then wildcard, then the implicit
    `*` catch-all (unlisted TLD = 1-label suffix). Zero exchanges, zero
    python — the rule lists ride as array literals inside whole-stage
    codegen, so at 100 TB this is a free column on the scan.

    Adds ``public_suffix`` (string) and ``registrable_domain`` (string,
    NULL when the host IS a suffix). Exception rules are 2-label (the
    PSL's real exceptions all are)."""
    labels = F.split(F.col(host_col), r"\.")
    n = F.size(labels)

    def lastk(k):
        return F.array_join(F.slice(labels, n - k + 1, k), ".")

    def isin(cand, rules):
        if not rules:
            return F.lit(False)
        return F.array_contains(F.array(*[F.lit(r) for r in rules]), cand)

    suffix_len = (
        F.when((n >= 2) & isin(lastk(2), exceptions), F.lit(1))
        .when((n >= 3) & isin(lastk(3), rules3), F.lit(3))
        .when((n >= 2) & isin(lastk(2), rules2), F.lit(2))
        .when((n >= 2) & isin(F.element_at(labels, n), wildcard_bases), F.lit(2))
        .when(isin(F.element_at(labels, n), rules1), F.lit(1))
        .otherwise(F.lit(1))
    )
    # let-bind suffix_len ONCE via a single-element transform: suffix and
    # reg reference the lambda VARIABLE, not copies of the rule-matching
    # CASE tree. Naive substitution embeds that tree 3x (suffix once, reg
    # twice in the slice args); fused into a downstream hashAgg's group
    # key (domain_quality_prior) the generated method then crossed
    # janino's 64 KB limit and the whole stage fell back to interpreted
    # eval. The one-element HOF is O(1) per row.
    bound = F.element_at(
        F.transform(
            F.array(suffix_len.cast("int")),
            lambda sl: F.struct(
                F.array_join(F.slice(labels, n - sl + 1, sl), ".").alias("ps"),
                F.when(
                    n > sl, F.array_join(F.slice(labels, n - sl, sl + 1), ".")
                ).alias("rd"),
            ),
        ),
        1,
    )
    tmp = df.withColumn("_psl", bound)
    return (
        tmp.withColumn("public_suffix", F.col("_psl").getField("ps"))
        .withColumn("registrable_domain", F.col("_psl").getField("rd"))
        .drop("_psl")
    )


def canonical_url(url: str) -> str:
    url = url.strip()
    if not url:
        return ""
    try:
        parts = urlsplit(url)
        # .hostname/.port validate lazily and can ALSO raise (e.g. port
        # 99999 or 'abc' — routine in crawl data), so they stay inside the
        # guard: one malformed URL must never fail the task
        host = parts.hostname.lower() if parts.hostname else ""
        port = parts.port
    except ValueError:
        return url
    scheme = parts.scheme.lower()
    if port and not (
        (scheme == "http" and port == 80) or (scheme == "https" and port == 443)
    ):
        host = f"{host}:{port}"
    userinfo = ""
    if parts.username:
        userinfo = parts.username
        if parts.password:
            userinfo += f":{parts.password}"
        userinfo += "@"

    path = parts.path or "/"
    # resolve ./.. and collapse duplicate slashes
    path = posixpath.normpath(path)
    if parts.path.endswith("/") and not path.endswith("/"):
        path += "/"
    if path == ".":
        path = "/"

    params = [
        (k, v)
        for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if not (k.lower().startswith("utm_") or k.lower() in _TRACKING)
    ]
    query = urlencode(sorted(params))
    return urlunsplit((scheme, userinfo + host, path, query, ""))


def leakage_safe_split(
    df: DataFrame,
    host_col: str = "host",
    *,
    val_pct: int = 5,
    test_pct: int = 5,
) -> DataFrame:
    """Train/val/test assignment keyed by REGISTRABLE DOMAIN, not url:
    near-duplicate pages of one site (templates, mirrors, pagination) land
    in the SAME split, so eval never sees train-set boilerplate — the
    standard leakage guard for web-corpus evals.

    split = poly_hash(registrable_domain) % 100 bucketed into
    test (< test_pct) / val (< test_pct+val_pct) / train. Hosts that ARE a
    bare public suffix hash their suffix. Pure Column algebra on top of
    :func:`registrable_domain` — zero exchanges, exact in any engine
    (portable polynomial hash)."""
    from .corpus_filters import _poly_hash

    with_reg = registrable_domain(df, host_col)
    key = F.coalesce(F.col("registrable_domain"), F.col("public_suffix"))
    bucket = _poly_hash(key) % 100
    return with_reg.withColumn(
        "split",
        F.when(bucket < test_pct, F.lit("test"))
        .when(bucket < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train")),
    )


# language path segments recognized for bitext URL matching (whitelist —
# bare 2-letter segments like /js/ or /up/ must NOT strip)
BITEXT_LANGS = "en fr de es zh pt it ru ja ko nl pl ar tr".split()


def bitext_candidates(
    pages: DataFrame, *, url_col: str = "url", lang_col: str = "lang"
) -> DataFrame:
    """ParaCrawl-style bitext mining by URL pattern: two pages whose urls
    differ ONLY by a language path segment (/en/x vs /fr/x) are
    translation-pair candidates — the standard first-stage filter before
    any content alignment.

    The stripped-url key replaces EVERY whitelisted language segment with
    ``*`` (Spark regexp_replace is global); pages with no such segment
    never pair. ONE hash exchange
    on the key (self-equi-join); the ordered lang_a < lang_b condition
    emits each pair once. Output:
    (pair_key, url_a, lang_a, url_b, lang_b)."""
    pat = "/(" + "|".join(BITEXT_LANGS) + ")(/|$)"
    key = F.regexp_replace(F.col(url_col), pat, "/*$2")
    keyed = (
        pages.select(
            key.alias("pair_key"),
            F.col(url_col).alias("u"),
            F.col(lang_col).alias("l"),
        )
        .where(key != F.col(url_col))
        # duplicate (url, lang) rows would multiply every pair; and a url
        # carrying two conflicting lang labels must not pair with itself
        .distinct()
    )
    a = keyed.select("pair_key", F.col("u").alias("url_a"), F.col("l").alias("lang_a"))
    b = keyed.select("pair_key", F.col("u").alias("url_b"), F.col("l").alias("lang_b"))
    return (
        a.join(b, "pair_key")
        .where(F.col("lang_a") < F.col("lang_b"))
        .where(F.col("url_a") != F.col("url_b"))
    )


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    def gen(batches):
        import pandas as pd

        for pdf in batches:
            out = pdf[[c for c in pdf.columns]].copy()
            out["canonical_url"] = [canonical_url(str(u)) for u in pdf[url_col]]
            yield out

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(gen, schema=schema + ", canonical_url string")


def surt_keys(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append the SURT key (Sort-friendly URI Reordering Transform) ->
    ``surt`` column: ``com,example)/path?a=1&b=2``.

    SURT is the canonical key of web-archive URL indexes (Wayback CDX,
    Common Crawl's cc-index): reversing the host labels makes one
    registrable domain a contiguous key RANGE, so range-partitioning an
    index by SURT keeps a site's urls in one shard — the locality that
    host-hashed keys destroy. Documented contract (pinned by tests and
    the DuckDB oracle): host lowercased, userinfo dropped, ports :80/:443
    dropped, a leading ``www.`` dropped, labels reversed and
    comma-joined; path kept verbatim (default ``/``), fragment dropped,
    query parameters sorted bytewise as whole ``k=v`` tokens with an
    empty query dropping the ``?``.

    Pure Column algebra — regexp extracts + split/sort/reverse/join, zero
    exchanges and zero Python, so it composes under any scan."""
    u = F.col(url_col)
    hostport = F.regexp_replace(
        F.lower(F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)),
        r"^[^@]*@",
        "",
    )
    host = F.regexp_replace(
        F.regexp_replace(hostport, r":(80|443)$", ""), r"^www\.", ""
    )
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    surt = F.concat(
        rev,
        F.lit(")"),
        path,
        F.when(query != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )
    return df.withColumn("surt", surt)


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append integer lexical URL features — the classic URL-spam /
    low-quality-host signals (long hosts stuffed with hyphens and
    digits, deep paths, parameter-heavy dynamic urls) that feed
    `quality_classifier`-style gates WITHOUT touching page bytes.

    All features are exact integers derived by pure Column algebra
    (regexp_extract / regexp_count) — zero exchanges, zero Python, fully
    codegen'd, and each has a closed re-derivation in the DuckDB oracle:

    - ``url_len``           length of the whole url string
    - ``host_len``          length of the authority (userinfo kept: it's
                            itself a spam signal)
    - ``subdomain_depth``   dots in the authority
    - ``host_hyphens``      hyphens in the authority
    - ``path_depth``        '/' count in the path part
    - ``n_params``          query parameters (0 for no '?')
    - ``digit_milli``       1000 * digits(url) / url_len (0 for empty)
    """
    u = F.col(url_col)
    host = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    ulen = F.length(u)
    return df.select(
        "*",
        ulen.cast("int").alias("url_len"),
        F.length(host).cast("int").alias("host_len"),
        F.regexp_count(host, F.lit(r"\.")).cast("int").alias("subdomain_depth"),
        F.regexp_count(host, F.lit("-")).cast("int").alias("host_hyphens"),
        F.regexp_count(path, F.lit("/")).cast("int").alias("path_depth"),
        F.when(query == "", F.lit(0))
        .otherwise(F.regexp_count(query, F.lit("&")) + 1)
        .cast("int")
        .alias("n_params"),
        F.when(ulen == 0, F.lit(0))
        .otherwise(
            # floor == integer div here (operands non-negative)
            F.floor(
                (F.lit(1000) * F.regexp_count(u, F.lit(r"[0-9]"))).cast("long")
                / ulen.cast("long")
            )
        )
        .cast("int")
        .alias("digit_milli"),
    )


def domain_quality_prior(
    df: DataFrame,
    *,
    host_col: str = "host",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Site-level quality prior (the RefinedWeb/Gopher site-curation
    signal): per-document integer quality folded to its REGISTRABLE
    DOMAIN (never the raw hostname — subdomain farms would dilute the
    prior the same way they dilute leakage_safe_split), then joined back
    so each page carries (own score, site prior, delta).

    All-integer scoring, so the DuckDB oracle replays it exactly:

        q_milli = 1000 - (1000 * n_digits) // n_chars   if the gates pass
                  (n_tokens >= 5 AND 2*n_tokens <= n_alpha_chars
                   <= 12*n_tokens, the integer form of the avg-token-len
                   gate in text_analysis.quality_features), else 0

    Scale shape: domain derivation is free Column algebra on the scan;
    ONE domain groupBy (map-side partial agg, output bounded by distinct
    domains); the per-domain table is BROADCAST back (a domain table is
    millions of rows at web scale — far under executor memory), so pages
    never shuffle. prior_milli = floor(sum/count) via double (exact
    below 2^53)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_digits = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    n_spaces = n_chars - F.length(F.regexp_replace(t, r" ", ""))
    n_alpha = n_chars - n_spaces
    n_tokens = F.size(F.filter(F.split(F.trim(t), r"\s+"), lambda x: x != ""))
    q_milli = F.when(
        (n_tokens >= 5)
        & (n_alpha >= 2 * n_tokens)
        & (n_alpha <= 12 * n_tokens)
        & (n_chars > 0),
        F.lit(1000) - F.floor((F.lit(1000) * n_digits) / n_chars),
    ).otherwise(F.lit(0)).cast("long")

    per_doc = registrable_domain(
        df.select(id_col, host_col, text_col), host_col
    ).select(
        id_col,
        F.coalesce(F.col("registrable_domain"), F.col("public_suffix")).alias(
            "domain"
        ),
        q_milli.alias("q_milli"),
    )
    agg = per_doc.groupBy("domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_domain"),
        F.floor(F.sum("q_milli") / F.count(F.lit(1))).cast("long").alias("prior_milli"),
    )
    return per_doc.join(F.broadcast(agg), "domain").select(
        id_col,
        "domain",
        "q_milli",
        "n_docs_domain",
        "prior_milli",
        (F.col("q_milli") - F.col("prior_milli")).cast("long").alias("delta_milli"),
    )


# --------------------------------------------------------------------------
# IDN homograph detection (Unicode TR#39 confusables, NFC skeletons)
# --------------------------------------------------------------------------

#: single source of truth for the confusable fold, shared verbatim with the
#: DuckDB oracle: the common Cyrillic lookalikes of Latin lowercase (the
#: pairs every registrar blocklist starts from, Unicode TR#39 confusables)
CONFUSABLES: tuple[tuple[str, str], ...] = (
    ("а", "a"),  # а CYRILLIC A
    ("е", "e"),  # е CYRILLIC IE
    ("о", "o"),  # о CYRILLIC O
    ("р", "p"),  # р CYRILLIC ER
    ("с", "c"),  # с CYRILLIC ES
    ("х", "x"),  # х CYRILLIC HA
    ("у", "y"),  # у CYRILLIC U
    ("і", "i"),  # і CYRILLIC-UKRAINIAN I
    ("ѕ", "s"),  # ѕ CYRILLIC DZE
    ("ј", "j"),  # ј CYRILLIC JE
    ("ԛ", "q"),  # ԛ CYRILLIC QA
    ("ԝ", "w"),  # ԝ CYRILLIC WE
)


def host_skeleton(host: str) -> str:
    """TR#39-style skeleton: punycode-decode ``xn--`` labels (RFC 3492 —
    IDN hosts arrive ACE-encoded in crawl URLs, so the famous
    all-Cyrillic xn--80ak6aa92e.com must fold to apple.com's skeleton),
    NFC normalize (folds decomposed accents the way every IDN registry
    compares labels), lowercase, then the confusable fold. Two hosts
    with equal skeletons but different raw strings are a homograph
    pair — the phishing shape IDN enabled."""
    import unicodedata

    from ..kernels.punycode import idn_to_unicode

    s = unicodedata.normalize("NFC", idn_to_unicode(host)).lower()
    for bad, good in CONFUSABLES:
        s = s.replace(bad, good)
    return s


def homograph_pairs(hosts_df: DataFrame, host_col: str = "host") -> DataFrame:
    """(host) -> (host_a, host_b, skeleton) for every pair of DISTINCT
    hosts sharing a skeleton, host_a < host_b.

    Scale shape: skeletons in ONE Arrow stage (python unicodedata — the
    NFC tables Spark lacks JVM-side); candidate generation is a bucketed
    self-equi-join on the skeleton key, never all-pairs — the same
    LSH-bucket shape as the dedup family. Skeleton groups are tiny by
    construction (lookalike families), so the join fans out O(group^2)
    on bounded groups."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            hs = [str(h) for h in pdf[host_col]]
            yield pd.DataFrame(
                {"host": hs, "skeleton": [host_skeleton(h) for h in hs]}
            )

    sk = (
        hosts_df.select(F.col(host_col))
        .mapInPandas(gen, schema="host string, skeleton string")
        .distinct()
    )
    a = sk.select(F.col("host").alias("host_a"), "skeleton")
    b = sk.select(F.col("host").alias("host_b"), "skeleton")
    return a.join(b, "skeleton").where(F.col("host_a") < F.col("host_b")).select(
        "host_a", "host_b", "skeleton"
    )


def url_path_templates(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Structural URL-template mining -> one row per (host, template)
    with ``n_urls`` and ``n_paths`` (distinct concrete paths): the
    crawler-trap / infinite-URL-space detector (calendar traps, session
    paths, faceted search). A template whose distinct-path count
    explodes while its content yield stays flat is a trap; at crawl
    scale this aggregate is THE fetch-budget gate per site, and it
    doubles as a URL-level dedup key (one canonical fetch per template
    when the site stamps ids into paths).

    Template rules (documented contract, replayed verbatim by the
    DuckDB oracle): >=8-char lowercase-hex runs -> ``{h}`` (ids,
    digests, uuids-sans-dashes), then digit runs -> ``{d}``. Pure
    Column algebra (two regexp_replace passes + one groupBy on
    (host, template) — hash-distributed, no hot key beyond a site's own
    template count)."""
    u = F.col(url_col)
    host = F.lower(F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
    path = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    template = F.regexp_replace(
        F.regexp_replace(path, r"[0-9a-f]{8,}", "{h}"), r"[0-9]+", "{d}"
    )
    return (
        df.select(host.alias("host"), path.alias("_path"), template.alias("template"))
        .groupBy("host", "template")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.countDistinct("_path").cast("long").alias("n_paths"),
        )
    )


def query_param_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """DATA-DRIVEN strip-param discovery -> one row per (host, param)
    with occurrence count, distinct-value count, and the distinct ratio
    in integer milli units: a param whose ratio sits near 1000 at high
    count is a session id / cache buster (every URL carries a fresh
    value), a near-zero ratio is a real facet. This LEARNS what
    `canonical_url`'s static tracking-param list hard-codes, so a crawl
    can canonicalize hosts it has never seen curated rules for.

    One explode over the query string + one (host, param) groupBy;
    ratio kept integral (floor milli) so engines hash identically."""
    u = F.col(url_col)
    host = F.lower(F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    pairs = df.select(
        host.alias("host"), F.explode(F.split(query, "&")).alias("_kv")
    ).where(F.col("_kv") != "")
    param = F.substring_index(F.col("_kv"), "=", 1)
    value = F.when(
        F.instr(F.col("_kv"), "=") > 0,
        F.expr("substring(_kv, instr(_kv, '=') + 1)"),
    ).otherwise(F.lit(""))
    return (
        pairs.select("host", param.alias("param"), value.alias("_v"))
        .groupBy("host", "param")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("_v").cast("long").alias("n_values"),
        )
        .withColumn(
            "ratio_milli",
            F.floor(F.lit(1000) * F.col("n_values") / F.col("n")).cast("long"),
        )
    )
