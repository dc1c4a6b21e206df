"""Connector CDK: the reference's user-extension surface for custom pull
sources (/root/reference/vaero_cdk/, ~340 LoC), re-expressed without the
Go<->Python subprocess hop (we are already Python; the reference shells
out per poll, /root/reference/integrations/sources/source_python.go:25-37).
"""

from vaero_ray.cdk.cursor import ApiCursor
from vaero_ray.cdk.http_connector import HTTPConnector, HTTPError
from vaero_ray.cdk.rate_limiters import BackoffRateLimiter, GiveUpError, SteadyRateLimiter

__all__ = [
    "ApiCursor",
    "HTTPConnector",
    "HTTPError",
    "BackoffRateLimiter",
    "GiveUpError",
    "SteadyRateLimiter",
]
