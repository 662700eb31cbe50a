"""NumPy golden tier: vectorized, scalar-exact host implementations.

Plays the role of the reference's src/scalar + src/fallback: always
available, used for exact error-path semantics, and registered as the
"fallback" implementation.
"""

from . import utf8, utf16, utf32, latin1, base64_impl  # noqa: F401
