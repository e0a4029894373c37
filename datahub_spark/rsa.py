"""Pure-python RSA for the node-security layer — RS256 JWTs and the
reference's PEM key-file formats, from public specifications only:

* key generation / RSASP1 / RSAVP1 / EMSA-PKCS1-v1_5 — RFC 8017
  (PKCS #1 v2.2) §3, §5.2, §9.2; probable primes by Miller-Rabin
  (FIPS 186-4 app. C.3);
* ``RSA PRIVATE KEY`` PEM = DER RSAPrivateKey (RFC 8017 app. A.1.2),
  what the reference writes via x509.MarshalPKCS1PrivateKey
  (internal/security/manager.go:235-249, rsautils.go:37-46);
* public key PEM = DER SubjectPublicKeyInfo (RFC 5280 §4.1.2.7 /
  RFC 3279 §2.3.1), what x509.MarshalPKIXPublicKey emits. The
  reference labels the PKIX bytes ``RSA PUBLIC KEY`` (rsautils.go:55);
  both that label and the standard ``PUBLIC KEY`` are accepted, and
  PKCS#1 RSAPublicKey bodies are parsed too.

No third-party crypto library exists in this container and none may be
installed, so the arithmetic lives here; it is small because RSA with
SHA-256/PKCS1-v1_5 needs only big-int modexp (python-native) and a
few fixed DER shapes. Signing uses the CRT form (RFC 8017 §5.1.2).
This exists for node-to-node auth parity with the reference
(RS256 node keypairs, manager.go:310-331) — not as a general crypto
library.
"""

from __future__ import annotations

import base64
import hashlib
import secrets
from dataclasses import dataclass

# -- primes ---------------------------------------------------------------

_SMALL_PRIMES = [3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47,
                 53, 59, 61, 67, 71, 73, 79, 83, 89, 97, 101, 103, 107,
                 109, 113, 127, 131, 137, 139, 149, 151, 157, 163, 167,
                 173, 179, 181, 191, 193, 197, 199]


def _is_probable_prime(n: int, rounds: int = 40) -> bool:
    """Miller-Rabin (FIPS 186-4 C.3.1); 40 random bases gives a
    2^-80 error bound, standard for key generation."""
    if n < 2:
        return False
    for p in _SMALL_PRIMES:
        if n % p == 0:
            return n == p
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for _ in range(rounds):
        a = secrets.randbelow(n - 3) + 2
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = pow(x, 2, n)
            if x == n - 1:
                break
        else:
            return False
    return True


def _random_prime(bits: int) -> int:
    while True:
        # top two bits set (product reaches full modulus size), odd
        cand = secrets.randbits(bits) | (3 << (bits - 2)) | 1
        if _is_probable_prime(cand):
            return cand


# -- keys -----------------------------------------------------------------


@dataclass(frozen=True)
class PublicKey:
    n: int
    e: int

    @property
    def byte_size(self) -> int:
        return (self.n.bit_length() + 7) // 8


@dataclass(frozen=True)
class PrivateKey:
    n: int
    e: int
    d: int
    p: int
    q: int
    dp: int
    dq: int
    qinv: int

    @property
    def public_key(self) -> PublicKey:
        return PublicKey(self.n, self.e)

    @property
    def byte_size(self) -> int:
        return (self.n.bit_length() + 7) // 8


def generate_keypair(bits: int = 2048) -> tuple[PrivateKey, PublicKey]:
    """GenerateRsaKeyPair (manager.go:133; rsautils.go:28) — e=65537."""
    if bits < 512:
        raise ValueError("RSA modulus below 512 bits is not a key")
    e = 65537
    while True:
        p = _random_prime(bits // 2)
        q = _random_prime(bits - bits // 2)
        if p == q:
            continue
        n = p * q
        if n.bit_length() != bits:
            continue
        lam = (p - 1) * (q - 1)
        if lam % e == 0:
            continue
        d = pow(e, -1, lam)
        if p < q:
            p, q = q, p
        priv = PrivateKey(n=n, e=e, d=d, p=p, q=q,
                          dp=d % (p - 1), dq=d % (q - 1),
                          qinv=pow(q, -1, p))
        return priv, priv.public_key


# -- PKCS#1 v1.5 SHA-256 signatures (the RS256 JWS primitive) -------------

# DigestInfo prefix for SHA-256, RFC 8017 §9.2 note 1
_SHA256_PREFIX = bytes.fromhex("3031300d060960864801650304020105000420")


def _emsa_pkcs1_v15(message: bytes, k: int) -> int:
    digest = hashlib.sha256(message).digest()
    t = _SHA256_PREFIX + digest
    if k < len(t) + 11:
        raise ValueError("modulus too small for SHA-256 signature")
    em = b"\x00\x01" + b"\xff" * (k - len(t) - 3) + b"\x00" + t
    return int.from_bytes(em, "big")


def sign_sha256(message: bytes, priv: PrivateKey) -> bytes:
    """RSASSA-PKCS1-v1_5 sign with SHA-256; CRT exponentiation
    (RFC 8017 §5.1.2) with the public-key recombination check that
    defends against fault-induced CRT errors."""
    m = _emsa_pkcs1_v15(message, priv.byte_size)
    s1 = pow(m, priv.dp, priv.p)
    s2 = pow(m, priv.dq, priv.q)
    h = (priv.qinv * (s1 - s2)) % priv.p
    s = s2 + h * priv.q
    if pow(s, priv.e, priv.n) != m:
        raise ValueError("CRT signature self-check failed")
    return s.to_bytes(priv.byte_size, "big")


def verify_sha256(message: bytes, signature: bytes, pub: PublicKey) -> bool:
    if len(signature) != pub.byte_size:
        return False
    s = int.from_bytes(signature, "big")
    if s >= pub.n:
        return False
    try:
        expected = _emsa_pkcs1_v15(message, pub.byte_size)
    except ValueError:
        return False
    # full encoded-message comparison (not just digest suffix), so
    # padding malleability is rejected
    return pow(s, pub.e, pub.n) == expected


# -- DER (just the shapes RSA keys need) ----------------------------------


def _der_len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    body = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(body)]) + body


def _der_int(v: int) -> bytes:
    body = v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")
    if body[0] & 0x80:
        body = b"\x00" + body
    return b"\x02" + _der_len(len(body)) + body


def _der_seq(*parts: bytes) -> bytes:
    body = b"".join(parts)
    return b"\x30" + _der_len(len(body)) + body


class _DerReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def _read_len(self) -> int:
        first = self.data[self.pos]
        self.pos += 1
        if first < 0x80:
            return first
        nbytes = first & 0x7F
        val = int.from_bytes(self.data[self.pos:self.pos + nbytes], "big")
        self.pos += nbytes
        return val

    def expect(self, tag: int) -> bytes:
        if self.pos >= len(self.data) or self.data[self.pos] != tag:
            raise ValueError(
                f"DER: expected tag {tag:#x} at offset {self.pos}")
        self.pos += 1
        length = self._read_len()
        body = self.data[self.pos:self.pos + length]
        if len(body) != length:
            raise ValueError("DER: truncated")
        self.pos += length
        return body

    def read_int(self) -> int:
        return int.from_bytes(self.expect(0x02), "big")


# rsaEncryption OID 1.2.840.113549.1.1.1 with NULL params (RFC 3279)
_RSA_ALG_ID = bytes.fromhex("300d06092a864886f70d0101010500")


def private_key_to_der(priv: PrivateKey) -> bytes:
    """RSAPrivateKey (RFC 8017 A.1.2) — the MarshalPKCS1PrivateKey
    layout the reference persists (rsautils.go:37-46)."""
    return _der_seq(
        _der_int(0), _der_int(priv.n), _der_int(priv.e), _der_int(priv.d),
        _der_int(priv.p), _der_int(priv.q), _der_int(priv.dp),
        _der_int(priv.dq), _der_int(priv.qinv))


def private_key_from_der(der: bytes) -> PrivateKey:
    rd = _DerReader(der)
    seq = _DerReader(rd.expect(0x30))
    version = seq.read_int()
    if version != 0:
        raise ValueError("unsupported RSAPrivateKey version")
    n, e, d, p, q, dp, dq, qinv = (seq.read_int() for _ in range(8))
    return PrivateKey(n, e, d, p, q, dp, dq, qinv)


def public_key_to_der(pub: PublicKey) -> bytes:
    """SubjectPublicKeyInfo wrapping RSAPublicKey — MarshalPKIXPublicKey
    (rsautils.go:50)."""
    rsa_pub = _der_seq(_der_int(pub.n), _der_int(pub.e))
    bit_string = b"\x03" + _der_len(len(rsa_pub) + 1) + b"\x00" + rsa_pub
    return _der_seq(_RSA_ALG_ID, bit_string)


def public_key_from_der(der: bytes) -> PublicKey:
    rd = _DerReader(der)
    seq = _DerReader(rd.expect(0x30))
    if seq.data[:1] == b"\x30":  # SubjectPublicKeyInfo: alg-id first
        alg = seq.expect(0x30)
        if not alg.startswith(bytes.fromhex("06092a864886f70d010101")):
            raise ValueError("not an rsaEncryption public key")
        bits = seq.expect(0x03)
        if not bits or bits[0] != 0:
            raise ValueError("unexpected BIT STRING padding")
        inner = _DerReader(bits[1:])
        nums = _DerReader(inner.expect(0x30))
    else:  # bare PKCS#1 RSAPublicKey
        nums = seq
    return PublicKey(nums.read_int(), nums.read_int())


# -- PEM ------------------------------------------------------------------


def _pem_wrap(label: str, der: bytes) -> str:
    b64 = base64.b64encode(der).decode()
    lines = [b64[i:i + 64] for i in range(0, len(b64), 64)]
    return (f"-----BEGIN {label}-----\n" + "\n".join(lines)
            + f"\n-----END {label}-----\n")


def _pem_unwrap(pem: str | bytes) -> tuple[str, bytes]:
    text = pem.decode() if isinstance(pem, bytes) else pem
    lines = [ln.strip() for ln in text.strip().splitlines()]
    if not lines or not lines[0].startswith("-----BEGIN "):
        raise ValueError("not a PEM block")
    label = lines[0][len("-----BEGIN "):].rstrip("-").strip()
    body = "".join(ln for ln in lines[1:] if not ln.startswith("-----"))
    return label, base64.b64decode(body)


def private_key_to_pem(priv: PrivateKey) -> str:
    return _pem_wrap("RSA PRIVATE KEY", private_key_to_der(priv))


def private_key_from_pem(pem: str | bytes) -> PrivateKey:
    label, der = _pem_unwrap(pem)
    if "PRIVATE KEY" not in label:
        raise ValueError(f"expected a private key PEM, got {label!r}")
    return private_key_from_der(der)


def public_key_to_pem(pub: PublicKey, label: str = "RSA PUBLIC KEY") -> str:
    """The reference writes PKIX bytes under ``RSA PUBLIC KEY``
    (rsautils.go:55-58); default matches it for file-level parity."""
    return _pem_wrap(label, public_key_to_der(pub))


def public_key_from_pem(pem: str | bytes) -> PublicKey:
    label, der = _pem_unwrap(pem)
    if "PUBLIC KEY" not in label:
        raise ValueError(f"expected a public key PEM, got {label!r}")
    return public_key_from_der(der)
