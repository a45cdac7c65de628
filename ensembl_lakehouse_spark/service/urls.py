"""Presigned result URLs (SURVEY §2 S12).

The reference returns S3 presigned URLs for query results and
export artifacts (app/main.py:272,339,352 —
``generate_presigned_url('get_object', ExpiresIn=3600)``,
TTL constant app/constants.py:16). The portable equivalent of a
presigned URL is an HMAC-signed, expiring path token: the URL
carries (path, expiry, signature) and the server verifies the
signature before serving bytes — same trust model (possession of
the URL grants time-limited read access, server holds the secret),
no cloud dependency. S3-backed deployments swap this module for
boto3's presigner; callers only see an opaque URL either way.
"""

from __future__ import annotations

import hashlib
import hmac
import secrets
import time
from urllib.parse import quote

#: Reference TTL (app/constants.py:16).
PRESIGNED_URL_EXPIRATION_SECONDS = 3600


class UrlSigner:
    def __init__(self, secret: bytes | None = None, clock=time.time):
        self._secret = secret if secret is not None else secrets.token_bytes(32)
        self._clock = clock

    def _sig(self, path: str, expires: int) -> str:
        msg = f"{path}|{expires}".encode()
        return hmac.new(self._secret, msg, hashlib.sha256).hexdigest()

    def sign(self, path: str, ttl_seconds: int = PRESIGNED_URL_EXPIRATION_SECONDS) -> str:
        """Return a relative presigned URL for ``path``."""
        expires = int(self._clock()) + ttl_seconds
        return (
            f"/download?path={quote(path, safe='')}"
            f"&expires={expires}&signature={self._sig(path, expires)}"
        )

    def verify(self, path: str, expires: str | int, signature: str) -> bool:
        """True iff the signature matches and the URL is unexpired.

        ``path`` must be the already-percent-decoded value (the HTTP
        layer's parse_qs decodes exactly once); decoding again here
        would break any path whose literal text looks percent-encoded
        (e.g. a directory named ``v%20final``) — sign and verify must
        hash the same representation."""
        try:
            exp = int(expires)
        except (TypeError, ValueError):
            return False
        if self._clock() >= exp:
            return False
        return hmac.compare_digest(self._sig(path, exp), signature)
