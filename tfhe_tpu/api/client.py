"""Thin HTTP client of the FHE server.

Role of the reference's luxfhejs client (reference:
packages/luxfhejs/src/index.ts:42-273 LuxFHEClient encrypt_uint8..256 /
unseal) and the hardhat plugin's HTTP calls (packages/hardhat-plugin/src/
index.ts:26-142 encrypt/decrypt/getPublicKey).
"""

from __future__ import annotations

import json
import urllib.request


class FheClient:
    def __init__(self, base_url: str):
        self.base = base_url.rstrip("/")

    def _get(self, path: str):
        with urllib.request.urlopen(self.base + path) as r:
            return json.loads(r.read())

    def _post(self, path: str, body: dict):
        req = urllib.request.Request(
            self.base + path,
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req) as r:
                return json.loads(r.read())
        except urllib.error.HTTPError as e:
            raise FheClientError(e.code, json.loads(e.read()).get("error", ""))

    def health(self):
        return self._get("/health")

    def get_public_key(self):
        return self._get("/publickey")

    def encrypt(self, value: int, type_name: str = "euint8", **kw):
        return self._post("/encrypt", {"value": str(value), "type": type_name, **kw})

    def encrypt_uint8(self, v, **kw):
        return self.encrypt(v, "euint8", **kw)

    def encrypt_uint16(self, v, **kw):
        return self.encrypt(v, "euint16", **kw)

    def encrypt_uint32(self, v, **kw):
        return self.encrypt(v, "euint32", **kw)

    def encrypt_uint64(self, v, **kw):
        return self.encrypt(v, "euint64", **kw)

    def encrypt_uint128(self, v, **kw):
        return self.encrypt(v, "euint128", **kw)

    def encrypt_uint256(self, v, **kw):
        return self.encrypt(v, "euint256", **kw)

    def encrypt_address(self, v, **kw):
        return self.encrypt(int(v, 16) if isinstance(v, str) else v, "eaddress", **kw)

    def evaluate(self, op: str, *args):
        sargs = [a if isinstance(a, str) else str(a) for a in args]
        return self._post("/evaluate", {"op": op, "args": sargs})

    def decrypt(self, handle: str):
        return int(self._post("/decrypt", {"handle": handle})["value"])

    def verify(self, handles: list):
        return self._post("/verify", {"handles": handles})["valid"]

    def public_decrypt(self, handles: list):
        return self._post("/public-decrypt", {"handles": handles})

    def user_decrypt(self, pairs: list, user: str):
        return self._post(
            "/user-decrypt",
            {
                "handleContractPairs": [
                    {"handle": h, "contractAddress": c} for h, c in pairs
                ],
                "userAddress": user,
            },
        )


class FheClientError(Exception):
    def __init__(self, code: int, msg: str):
        super().__init__(f"HTTP {code}: {msg}")
        self.code = code
