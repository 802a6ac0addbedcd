"""Minimal i18n for user-facing strings (ref tools/i18n/i18n.py I18nAuto).

Locale maps are plain dicts; unknown keys fall through to the key itself,
matching the reference behavior. Add locales by extending LOCALES or
passing a custom mapping."""

from __future__ import annotations

import locale
import os

LOCALES: dict[str, dict[str, str]] = {
    "zh_CN": {
        "reference audio required": "需要参考音频",
        "text is required": "需要输入文本",
        "training started": "训练已开始",
        "training already running": "训练已在进行中",
        "model loaded": "模型已加载",
        "synthesis done": "合成完成",
    },
    "en_US": {},
}


class I18nAuto:
    def __init__(self, language: str | None = None):
        if language is None:
            language = os.environ.get("language") or (locale.getdefaultlocale()[0] or "en_US")
        if language not in LOCALES:
            language = "en_US"
        self.language = language
        self._map = LOCALES[language]

    def __call__(self, key: str) -> str:
        return self._map.get(key, key)
