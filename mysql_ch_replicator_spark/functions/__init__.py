from .conversions import conversion_expr, convert_payload, default_for

__all__ = ["conversion_expr", "convert_payload", "default_for"]
