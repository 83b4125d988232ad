from .matcher import MatchResult, match_segments  # noqa: F401
