"""robots.txt parsing and matching — RFC 9309 (public spec), from
scratch.

A polite crawler filters its frontier against each host's robots rules;
at corpus scale that is a broadcast-side lookup (the robots map is tiny
next to the url stream), so the matcher lives here as a pure function
and the Ray stage (:func:`pypdfium2_ray.stages.scan.robots_filter`-style
composition in ``__ray_entry__``) ships the parsed rule table through
the object store once.

Semantics per RFC 9309:

- group selection: the group(s) whose ``User-agent`` line matches the
  product token (case-insensitive; ``*`` is the fallback only when no
  specific group matched),
- rule matching: ``Allow``/``Disallow`` by LONGEST matched pattern;
  on a length tie Allow wins,
- pattern syntax: ``*`` matches any char sequence, ``$`` anchors the
  end; otherwise prefix match,
- an empty ``Disallow:`` matches nothing; no matching rule => allowed.
"""

from __future__ import annotations

import re


def parse_robots(text: str, agent: str = "graftbot") -> list[tuple[str, bool]]:
    """Parse robots.txt into the rule list applying to *agent*:
    ``[(pattern, allow)]``. Group selection per RFC 9309 §2.2.1: the
    most specific matching user-agent token wins; ``*`` groups apply
    only when no named group matched."""
    agent = agent.lower()
    groups: dict[str, list[tuple[str, bool]]] = {}
    current: list[str] = []
    rules_open = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if rules_open:          # a new group starts after rule lines
                current = []
                rules_open = False
            ua = value.lower()
            current.append(ua)
            groups.setdefault(ua, [])
        elif field in ("allow", "disallow"):
            rules_open = True
            if value:               # empty value matches nothing (§2.2.2)
                for ua in current:
                    groups.setdefault(ua, []).append(
                        (value, field == "allow"))
    # most specific matching token: longest ua token contained in agent
    best = None
    for ua in groups:
        if ua != "*" and ua in agent:
            if best is None or len(ua) > len(best):
                best = ua
    if best is not None:
        return groups[best]
    return groups.get("*", [])


def _pattern_matches(pattern: str, path: str) -> int:
    """Match length (the RFC's specificity measure = len(pattern)) or -1.
    ``*`` = any sequence, trailing ``$`` = end anchor."""
    anchored = pattern.endswith("$")
    pat = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in pat)
    rx = rx + "$" if anchored else rx
    return len(pattern) if re.match(rx, path) else -1


def is_allowed(rules: list[tuple[str, bool]], path: str) -> bool:
    """Longest-match evaluation; Allow wins length ties; no match =>
    allowed (RFC 9309 §2.2.2)."""
    best_len = -1
    best_allow = True
    for pattern, allow in rules:
        m = _pattern_matches(pattern, path)
        if m > best_len or (m == best_len and allow and not best_allow):
            if m >= 0:
                best_len, best_allow = m, allow
    return best_allow if best_len >= 0 else True


def robots_gate(ds, robots_by_host: dict[str, str], url_col: str = "url",
                agent: str = "graftbot",
                url_re: str = r"^[a-z]+://(?P<host>[^/]+)(?P<path>/.*)$"):
    """Crawl-politeness filter: drop rows whose url path a host's
    robots.txt disallows for *agent*. The robots map (tiny next to the
    url stream) is parsed ONCE driver-side into per-host rule lists and
    broadcast through the object store; per-row evaluation is inherent
    (longest-match over a host's rules, like any robots matcher), but
    rules are pre-parsed and hosts with no rules shortcut to a
    vectorized pass-through. Unknown hosts are allowed (no robots =>
    crawl), per RFC 9309 §2.4 on unavailability."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    parsed = {h: parse_robots(t, agent) for h, t in robots_by_host.items()}
    parsed = {h: r for h, r in parsed.items() if r}
    ref = ray.put(parsed)
    pat = url_re

    def gate(t: pa.Table) -> pa.Table:
        rules_by_host = ray.get(ref)
        ex = pc.extract_regex(t[url_col], pat)
        hosts = pc.struct_field(ex, "host").to_pylist()
        paths = pc.struct_field(ex, "path").to_pylist()
        keep = [h is None or (r := rules_by_host.get(h)) is None
                or is_allowed(r, p)
                for h, p in zip(hosts, paths)]
        return t.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(gate, batch_format="pyarrow")
