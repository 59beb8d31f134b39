"""Legacy console-command shims (reference: m6anet/deprecated/*) — the old
per-command entry points kept alive with a DeprecationWarning."""
