from .logit_mvn import LogitMVN, logit

__all__ = ["LogitMVN", "logit"]
