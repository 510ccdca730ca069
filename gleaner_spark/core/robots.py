"""robots.txt parsing + Google-spec matching.

Replaces the reference's use of github.com/temoto/robotstxt
(/root/reference/internal/summoner/acquire/utils.go:11-40,
resources.go:43-66,95): group selection by longest agent-prefix
match with ``*`` fallback, longest-rule-wins path matching with
``*``/``$`` wildcards (allow wins ties), per-group crawl-delay, and
the file-global ``Sitemap:`` list used by ``robots``-type sources.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class Rule:
    allow: bool
    pattern: str
    _rx: re.Pattern | None = None

    def matches(self, path: str) -> bool:
        if self._rx is None:
            self._rx = _compile_pattern(self.pattern)
        return self._rx.match(path) is not None

    @property
    def specificity(self) -> int:
        return len(self.pattern)


def _compile_pattern(pattern: str) -> re.Pattern:
    out = []
    i = 0
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    for ch in body:
        if ch == "*":
            out.append(".*")
        else:
            out.append(re.escape(ch))
    rx = "".join(out) + ("$" if anchored else "")
    return re.compile(rx)


@dataclass
class Group:
    agents: list[str] = field(default_factory=list)
    rules: list[Rule] = field(default_factory=list)
    crawl_delay: float = 0.0  # seconds

    def test(self, path_or_url: str) -> bool:
        """True if fetching is allowed. Longest-pattern rule wins;
        allow wins ties; no match => allowed."""
        path = path_or_url
        if "://" in path_or_url:
            m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/]*(.*)$", path_or_url)
            path = m.group(1) if m else path_or_url
            if path == "":
                path = "/"
        best: Rule | None = None
        for rule in self.rules:
            if not rule.pattern:
                continue  # empty Disallow: allows everything
            if rule.matches(path):
                if (
                    best is None
                    or rule.specificity > best.specificity
                    or (rule.specificity == best.specificity and rule.allow and not best.allow)
                ):
                    best = rule
        return True if best is None else best.allow


@dataclass
class RobotsData:
    groups: list[Group] = field(default_factory=list)
    sitemaps: list[str] = field(default_factory=list)

    def find_group(self, agent: str) -> Group | None:
        """Longest agent-token prefix match (case-insensitive), else
        the ``*`` group, else None (temoto FindGroup semantics)."""
        agent_l = agent.lower()
        best: Group | None = None
        best_len = -1
        star: Group | None = None
        for g in self.groups:
            for a in g.agents:
                al = a.lower()
                if al == "*":
                    if star is None:
                        star = g
                elif agent_l.startswith(al) and len(al) > best_len:
                    best, best_len = g, len(al)
        return best if best is not None else star


def parse_robots_txt(body: str) -> RobotsData:
    data = RobotsData()
    current: Group | None = None
    last_was_agent = False
    for raw_line in body.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if current is None or not last_was_agent:
                current = Group()
                data.groups.append(current)
            current.agents.append(value)
            last_was_agent = True
            continue
        last_was_agent = False
        if key == "sitemap":
            data.sitemaps.append(value)
        elif current is not None and key in ("disallow", "allow"):
            current.rules.append(Rule(allow=(key == "allow"), pattern=value))
        elif current is not None and key == "crawl-delay":
            try:
                current.crawl_delay = float(value)
            except ValueError:
                pass
    return data


def robots_allowed(url: str, body: str | None, agent: str) -> bool:
    """Convenience for vectorized evaluation: no robots => allowed
    (resources.go:51-57 continues without robots on fetch error)."""
    if body is None:
        return True
    group = parse_robots_txt(body).find_group(agent)
    return True if group is None else group.test(url)


def resolve_crawl_delay_ms(robots_delay_s: float | None, config_delay_ms: int) -> int:
    """overrideCrawlDelayFromRobots (resources.go:173-180): the
    reference computes max(robots_seconds, config_delay) mixing units
    (robots value in SECONDS vs config delay in MILLISECONDS); the
    pinned test (resources_test.go:76-82) relies on max(10, 1) == 10.
    Reproduced as-is for parity."""
    if robots_delay_s is None:
        return config_delay_ms
    return int(max(robots_delay_s, config_delay_ms))
