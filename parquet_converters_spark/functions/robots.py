"""Robots Exclusion Protocol (RFC 9309) gate — the crawl-governance
stage of a training-data pipeline: which fetched URLs may actually be
used, per the site's published rules.  From the RFC alone:

* **group selection** (section 2.2.1): the group whose ``User-agent``
  line case-insensitively equals the crawler's product token; the
  ``*`` group is the fallback; multiple ``User-agent`` lines may head
  one shared group.
* **rule matching** (2.2.2): ``Allow``/``Disallow`` values are path
  patterns matched from the first octet; ``*`` matches any octet
  sequence, a trailing ``$`` anchors the end.
* **precedence** (2.2.2): the LONGEST matched pattern wins; on an
  allow/disallow tie at equal length, ALLOW wins.  No matching rule
  (including an empty ``Disallow:``, which is rule-less) = allowed.

Scale posture: robots tables are per-domain dimensions — tiny next
to the URL fact table — so :func:`robots_gate` BROADCASTS the
compiled rules to a single Arrow-batched narrow stage over the URLs;
no shuffle touches the fact side.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


from functools import lru_cache


@lru_cache(maxsize=8192)
def _pattern_regex(pattern: str) -> re.Pattern:
    """RFC 9309 path pattern -> anchored regex: ``*`` is any octet
    sequence, trailing ``$`` anchors the end, everything else is
    literal (match starts at the first path octet).  Cached so the
    per-URL hot loop never rebuilds regex source strings (re's own
    512-entry cache purges wholesale under multi-domain batches)."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    body = "".join(
        ".*" if ch == "*" else re.escape(ch) for ch in pattern
    )
    return re.compile("^" + body + ("$" if anchored else ""))


def parse_robots(txt: str, agent: str) -> list[tuple[bool, str]]:
    """Rules ``[(allow, pattern), ...]`` of the group that governs
    ``agent``: ALL groups with a case-insensitively matching
    ``User-agent`` line combined (RFC 9309 2.2.1), else the
    combined ``*`` groups, else no rules.
    Comments (``#`` to end of line) stripped; unknown directives
    ignored (the RFC requires tolerating extensions); empty rule
    values are rule-less (an empty ``Disallow:`` allows everything)."""
    agent = agent.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    in_group_header = True
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        name, sep, value = line.partition(":")
        if not sep:
            continue
        name = name.strip().lower()
        value = value.strip()
        if name == "user-agent":
            if not in_group_header:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
            cur_agents.append(value.lower())
            in_group_header = True
        elif name in ("allow", "disallow"):
            in_group_header = False
            if cur_agents and value:
                cur_rules.append((name == "allow", value))
            # empty value: rule-less line, contributes nothing
            if not cur_agents:
                # rules before any User-agent line govern nobody
                continue
        # other directives (sitemap, crawl-delay, ...): ignored
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    # RFC 9309 2.2.1: ALL groups matching the agent combine into one
    # rule set (real robots.txt often repeats a token across sections)
    exact: list[tuple[bool, str]] = []
    fallback: list[tuple[bool, str]] = []
    saw_exact = saw_star = False
    for agents, rules in groups:
        if agent in agents:
            saw_exact = True
            exact.extend(rules)
        if "*" in agents:
            saw_star = True
            fallback.extend(rules)
    if saw_exact:
        return exact
    return fallback if saw_star else []


def robots_allowed(rules: list[tuple[bool, str]], path: str) -> bool:
    """RFC 9309 decision: longest matched pattern wins; allow wins a
    length tie; no match allows."""
    best_len = -1
    best_allow = True
    for allow, pattern in rules:
        if _pattern_regex(pattern).match(path):
            plen = len(pattern)
            if plen > best_len or (plen == best_len and allow):
                best_len = plen
                best_allow = allow
    return best_allow


def robots_gate(
    urls: DataFrame,
    robots: DataFrame,
    agent: str,
    url_col: str = "url",
    domain_col: str = "domain",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """Annotate a URL fact table with the RFC 9309 decision:
    ``urls + (allowed boolean)``.

    ``robots`` is the per-domain dimension ``(domain, robots_txt)`` —
    broadcast-joined onto the facts (robots bodies are a rounding
    error next to a 100 TB URL table), then ONE Arrow-batched narrow
    stage parses each distinct domain's rules once per partition
    (size-capped memo — hot domains parse once, a many-domain
    partition stays bounded) and decides every URL.  A URL whose domain has no
    robots row is allowed (no robots.txt = no restrictions, RFC 9309
    section 2.3.1.2 'unavailable' handling)."""
    from pyspark.sql import functions as F

    joined = urls.join(
        F.broadcast(robots.select(domain_col, robots_col)),
        on=domain_col, how="left",
    )
    in_cols = joined.columns
    out_cols = [c for c in in_cols if c != robots_col]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in joined.schema.fields if f.name != robots_col
    ) + ", allowed boolean"

    def run(batches):
        import pandas as pd

        # partition-lifetime memo with a hard size cap: hot domains
        # keep their parsed rules across Arrow batches (a multi-
        # thousand-line robots.txt is parsed once per partition, not
        # once per batch), while a partition spanning millions of
        # distinct domains can never accumulate unbounded rule lists
        # — on overflow the memo clears and rebuilds from the rows at
        # hand (crude LRU-free eviction, bounded by construction)
        _CACHE_CAP = 256
        cache: dict[str, list[tuple[bool, str]]] = {}
        for pdf in batches:
            allowed = []
            for txt, url in zip(pdf[robots_col], pdf[url_col]):
                # no robots row OR no url: nothing to test a rule
                # against — allowed (never crash the 100 TB stage on
                # one null fact row)
                if txt is None or url is None:
                    allowed.append(True)
                    continue
                if txt not in cache:
                    if len(cache) >= _CACHE_CAP:
                        cache.clear()
                    cache[txt] = parse_robots(txt, agent)
                path = url
                # RFC 3986 schemes are case-insensitive
                m = re.match(r"[a-z][a-z0-9+.-]*://[^/]*", path, re.I)
                if m:
                    path = path[m.end():] or "/"
                allowed.append(robots_allowed(cache[txt], path))
            out = pdf[out_cols].copy()
            out["allowed"] = allowed
            yield out

    return joined.mapInPandas(run, schema)
