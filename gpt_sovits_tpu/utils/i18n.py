"""i18n for user-facing strings (ref tools/i18n/i18n.py I18nAuto).

Locale maps are plain dicts; unknown keys fall through to the key itself,
matching the reference behavior. Covered strings are the ones the webui
page and the HTTP APIs actually emit (tab names, action buttons, status /
error messages). The webui injects the active map into the page as an
`I18N` JS dict (serve/webui.py), selected by the `lang` query parameter
or the Accept-Language header.
"""

from __future__ import annotations

import locale
import os

LOCALES: dict[str, dict[str, str]] = {
    "zh_CN": {
        # webui chrome
        "TPU-native GPT-SoVITS control panel": "TPU 原生 GPT-SoVITS 控制面板",
        "Data tools": "数据工具",
        "Dataset": "数据集",
        "Inference": "推理",
        "Training": "训练",
        "Labels": "标注",
        "Jobs": "任务",
        "Run": "运行",
        "Load": "加载",
        "label proofreading": "标注校对",
        # API / service messages
        "ref_audio_path is required": "需要 ref_audio_path 参考音频路径",
        "text is required": "需要输入文本",
        "text_lang is required": "需要 text_lang 文本语言",
        "reference audio required": "需要参考音频",
        "no synthesizable text": "没有可合成的文本",
        "success": "成功",
        "training started": "训练已开始",
        "training already running": "训练已在进行中",
        "model loaded": "模型已加载",
        "synthesis done": "合成完成",
    },
    "ja_JP": {
        "TPU-native GPT-SoVITS control panel": "TPU ネイティブ GPT-SoVITS コントロールパネル",
        "Data tools": "データツール",
        "Dataset": "データセット",
        "Inference": "推論",
        "Training": "学習",
        "Labels": "ラベル",
        "Jobs": "ジョブ",
        "Run": "実行",
        "Load": "読み込み",
        "label proofreading": "ラベル校正",
        "ref_audio_path is required": "ref_audio_path（参照音声のパス）が必要です",
        "text is required": "テキストを入力してください",
        "text_lang is required": "text_lang（テキストの言語）が必要です",
        "reference audio required": "参照音声が必要です",
        "no synthesizable text": "合成可能なテキストがありません",
        "success": "成功",
        "training started": "学習を開始しました",
        "training already running": "学習は既に実行中です",
        "model loaded": "モデルを読み込みました",
        "synthesis done": "合成が完了しました",
    },
    "ko_KR": {
        "TPU-native GPT-SoVITS control panel": "TPU 네이티브 GPT-SoVITS 제어판",
        "Data tools": "데이터 도구",
        "Dataset": "데이터셋",
        "Inference": "추론",
        "Training": "학습",
        "Labels": "라벨",
        "Jobs": "작업",
        "Run": "실행",
        "Load": "불러오기",
        "label proofreading": "라벨 교정",
        "ref_audio_path is required": "ref_audio_path(참조 오디오 경로)가 필요합니다",
        "text is required": "텍스트를 입력하세요",
        "text_lang is required": "text_lang(텍스트 언어)가 필요합니다",
        "reference audio required": "참조 오디오가 필요합니다",
        "no synthesizable text": "합성할 텍스트가 없습니다",
        "success": "성공",
        "training started": "학습이 시작되었습니다",
        "training already running": "학습이 이미 실행 중입니다",
        "model loaded": "모델이 로드되었습니다",
        "synthesis done": "합성이 완료되었습니다",
    },
    "en_US": {},
}

# aliases the way browsers / env vars spell them
_ALIASES = {
    "zh": "zh_CN", "zh-CN": "zh_CN", "zh_TW": "zh_CN", "zh-TW": "zh_CN",
    "ja": "ja_JP", "ja-JP": "ja_JP",
    "ko": "ko_KR", "ko-KR": "ko_KR",
    "en": "en_US", "en-US": "en_US", "en_GB": "en_US", "en-GB": "en_US",
}


def resolve_language(language: str | None) -> str:
    if not language:
        language = os.environ.get("language") or (locale.getdefaultlocale()[0] or "en_US")
    language = _ALIASES.get(language, language)
    if language not in LOCALES:
        language = _ALIASES.get(language.split("_")[0].split("-")[0], "en_US")
    return language if language in LOCALES else "en_US"


class I18nAuto:
    def __init__(self, language: str | None = None):
        self.language = resolve_language(language)
        self._map = LOCALES[self.language]

    def __call__(self, key: str) -> str:
        return self._map.get(key, key)

    def mapping(self) -> dict[str, str]:
        return dict(self._map)
