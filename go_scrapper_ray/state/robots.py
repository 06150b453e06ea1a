"""Minimal robots.txt rules (rebuild-only feature; the reference IGNORES
robots — collyfunc.go:68,128 ``colly.IgnoreRobotsTxt()``.  The north rule
requires robots caching per host actor, with ``ignore_robots`` as the parity
mode).

Semantics: ``User-agent: *`` sections only; Allow/Disallow longest-prefix-match
wins (Google's documented rule); empty Disallow allows all."""

from __future__ import annotations

from dataclasses import dataclass
from urllib.parse import urlsplit


@dataclass
class RobotsRules:
    rules: list[tuple[bool, str]]  # (is_allow, path_prefix), longest-match wins

    @classmethod
    def parse(cls, text: str) -> "RobotsRules":
        rules: list[tuple[bool, str]] = []
        in_star = False
        for raw in text.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key = key.strip().lower()
            val = val.strip()
            if key == "user-agent":
                in_star = val == "*"
            elif in_star and key in ("allow", "disallow"):
                if val:
                    rules.append((key == "allow", val))
        return cls(rules)

    def allowed(self, url_or_path: str) -> bool:
        path = url_or_path
        if "://" in url_or_path or url_or_path.startswith("//"):
            p = urlsplit(url_or_path)
            path = p.path or "/"
            if p.query:
                path += "?" + p.query
        best_len = -1
        best_allow = True
        for is_allow, prefix in self.rules:
            if path.startswith(prefix) and len(prefix) > best_len:
                best_len = len(prefix)
                best_allow = is_allow
        return best_allow
