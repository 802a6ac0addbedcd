"""Generate the built-in Chinese lexicon data files.

Sources (linguistic data, not code):
  * word-level pinyin: the reference's polyphone-correction dictionary
    (/root/reference/GPT_SoVITS/text/g2pw/polyphonic.pickle, ~45k entries,
    used by chinese2.py correct_pronunciation) — pinyin readings for words
    whose characters are ambiguous in isolation
  * character default readings: majority vote over those word entries,
    weighted by jieba's word frequencies (jieba ships in the image), with a
    hand-curated override table for high-frequency function words whose
    most common reading in *running text* differs from their reading inside
    dictionary words (e.g. 的 de5 as a particle vs di4 in 目的)
  * traditional->simplified map: the character-pair table from the
    reference's zh_normalization/char_convert.py (itself from PaddleSpeech)

Outputs (committed):
  gpt_sovits_tpu/text/data/zh_pinyin.json.gz   {"words": {...}, "chars": {...}}
  gpt_sovits_tpu/text/data/zh_t2s.json.gz      {"trad": "...", "simp": "..."}

Run:  python scripts/gen_zh_data.py
"""

from __future__ import annotations

import gzip
import json
import os
import pickle
import re
import sys
from collections import Counter, defaultdict

REF = "/root/reference/GPT_SoVITS/text"
OUT = os.path.join(os.path.dirname(__file__), "..", "gpt_sovits_tpu", "text", "data")

# Default readings for high-frequency characters. The weighted vote below is
# biased toward readings inside dictionary words; as free-standing words these
# characters read differently. Standard Mandarin, hand-curated.
CHAR_OVERRIDES = {
    "的": "de5", "了": "le5", "着": "zhe5", "地": "di4", "得": "de2",
    "是": "shi4", "我": "wo3", "你": "ni3", "他": "ta1", "她": "ta1",
    "它": "ta1", "们": "men5", "不": "bu4", "在": "zai4", "有": "you3",
    "人": "ren2", "这": "zhe4", "那": "na4", "个": "ge4", "上": "shang4",
    "下": "xia4", "来": "lai2", "去": "qu4", "到": "dao4", "大": "da4",
    "小": "xiao3", "中": "zhong1", "为": "wei4", "和": "he2", "与": "yu3",
    "就": "jiu4", "都": "dou1", "而": "er2", "及": "ji2", "或": "huo4",
    "一": "yi1", "二": "er4", "三": "san1", "四": "si4", "五": "wu3",
    "六": "liu4", "七": "qi1", "八": "ba1", "九": "jiu3", "十": "shi2",
    "百": "bai3", "千": "qian1", "万": "wan4", "亿": "yi4", "零": "ling2",
    "两": "liang3", "几": "ji3", "第": "di4", "些": "xie1", "么": "me5",
    "什": "shen2", "谁": "shei2", "吗": "ma5", "呢": "ne5", "吧": "ba5",
    "啊": "a5", "呀": "ya5", "嘛": "ma5", "哦": "o5", "哪": "na3",
    "也": "ye3", "还": "hai2", "又": "you4", "再": "zai4", "很": "hen3",
    "太": "tai4", "最": "zui4", "更": "geng4", "真": "zhen1", "挺": "ting3",
    "能": "neng2", "会": "hui4", "要": "yao4", "想": "xiang3", "可": "ke3",
    "应": "ying1", "该": "gai1", "被": "bei4", "把": "ba3", "让": "rang4",
    "叫": "jiao4", "使": "shi3", "给": "gei3", "对": "dui4", "向": "xiang4",
    "从": "cong2", "于": "yu2", "以": "yi3", "之": "zhi1", "者": "zhe3",
    "所": "suo3", "因": "yin1", "但": "dan4", "却": "que4", "只": "zhi3",
    "即": "ji2", "若": "ruo4", "虽": "sui1", "然": "ran2", "如": "ru2",
    "说": "shuo1", "看": "kan4", "听": "ting1", "做": "zuo4", "作": "zuo4",
    "吃": "chi1", "喝": "he1", "走": "zou3", "跑": "pao3", "飞": "fei1",
    "坐": "zuo4", "站": "zhan4", "住": "zhu4", "用": "yong4", "拿": "na2",
    "打": "da3", "开": "kai1", "关": "guan1", "买": "mai3", "卖": "mai4",
    "写": "xie3", "读": "du2", "学": "xue2", "教": "jiao1", "问": "wen4",
    "答": "da2", "知": "zhi1", "道": "dao4", "觉": "jue2", "睡": "shui4",
    "爱": "ai4", "喜": "xi3", "欢": "huan1", "怕": "pa4", "笑": "xiao4",
    "哭": "ku1", "好": "hao3", "坏": "huai4", "新": "xin1", "旧": "jiu4",
    "高": "gao1", "低": "di1", "长": "chang2", "短": "duan3", "快": "kuai4",
    "慢": "man4", "早": "zao3", "晚": "wan3", "多": "duo1", "少": "shao3",
    "重": "zhong4", "轻": "qing1", "远": "yuan3", "近": "jin4", "前": "qian2",
    "后": "hou4", "左": "zuo3", "右": "you4", "里": "li3", "外": "wai4",
    "东": "dong1", "西": "xi1", "南": "nan2", "北": "bei3", "年": "nian2",
    "月": "yue4", "日": "ri4", "天": "tian1", "时": "shi2", "分": "fen1",
    "秒": "miao3", "点": "dian3", "半": "ban4", "今": "jin1", "明": "ming2",
    "昨": "zuo2", "现": "xian4", "家": "jia1", "国": "guo2", "城": "cheng2",
    "市": "shi4", "村": "cun1", "路": "lu4", "街": "jie1", "山": "shan1",
    "水": "shui3", "火": "huo3", "风": "feng1", "雨": "yu3", "雪": "xue3",
    "花": "hua1", "草": "cao3", "树": "shu4", "鸟": "niao3", "鱼": "yu2",
    "马": "ma3", "牛": "niu2", "羊": "yang2", "狗": "gou3", "猫": "mao1",
    "手": "shou3", "脚": "jiao3", "头": "tou2", "眼": "yan3", "耳": "er3",
    "口": "kou3", "心": "xin1", "身": "shen1", "体": "ti3", "气": "qi4",
    "声": "sheng1", "音": "yin1", "话": "hua4", "字": "zi4", "词": "ci2",
    "句": "ju4", "文": "wen2", "书": "shu1", "画": "hua4", "歌": "ge1",
    "事": "shi4", "物": "wu4", "东": "dong1", "面": "mian4", "边": "bian1",
    "方": "fang1", "样": "yang4", "种": "zhong3", "件": "jian4", "位": "wei4",
    "名": "ming2", "号": "hao4", "次": "ci4", "回": "hui2", "遍": "bian4",
    "场": "chang3", "间": "jian1", "空": "kong1", "没": "mei2", "别": "bie2",
    "每": "mei3", "各": "ge4", "另": "ling4", "其": "qi2", "此": "ci3",
    "彼": "bi3", "已": "yi3", "曾": "ceng2", "正": "zheng4", "刚": "gang1",
    "才": "cai2", "先": "xian1", "常": "chang2", "总": "zong3", "必": "bi4",
    "须": "xu1", "当": "dang1", "像": "xiang4", "似": "si4", "比": "bi3",
    "跟": "gen1", "同": "tong2", "等": "deng3", "着": "zhe5", "过": "guo4",
    "起": "qi3", "出": "chu1", "进": "jin4", "入": "ru4", "发": "fa1",
    "放": "fang4", "成": "cheng2", "变": "bian4", "干": "gan4", "生": "sheng1",
    "死": "si3", "活": "huo2", "老": "lao3", "子": "zi3", "儿": "er2",
    "女": "nv3", "男": "nan2", "爸": "ba4", "妈": "ma1", "兄": "xiong1",
    "朋": "peng2", "友": "you3", "师": "shi1", "员": "yuan2", "工": "gong1",
    "农": "nong2", "兵": "bing1", "医": "yi1", "病": "bing4", "药": "yao4",
    "钱": "qian2", "价": "jia4", "贵": "gui4", "便": "bian4", "宜": "yi2",
    "行": "xing2", "业": "ye4", "公": "gong1", "司": "si1", "厂": "chang3",
    "店": "dian4", "校": "xiao4", "班": "ban1", "课": "ke4", "考": "kao3",
    "题": "ti2", "数": "shu4", "理": "li3", "化": "hua4", "电": "dian4",
    "脑": "nao3", "机": "ji1", "车": "che1", "船": "chuan2", "票": "piao4",
    "门": "men2", "窗": "chuang1", "房": "fang2", "床": "chuang2", "桌": "zhuo1",
    "椅": "yi3", "灯": "deng1", "衣": "yi1", "裤": "ku4", "鞋": "xie2",
    "帽": "mao4", "饭": "fan4", "菜": "cai4", "肉": "rou4", "蛋": "dan4",
    "奶": "nai3", "茶": "cha2", "酒": "jiu3", "糖": "tang2", "盐": "yan2",
    "油": "you2", "米": "mi3", "色": "se4", "红": "hong2", "黄": "huang2",
    "蓝": "lan2", "绿": "lv4", "白": "bai2", "黑": "hei1", "灰": "hui1",
    "光": "guang1", "暗": "an4", "冷": "leng3", "热": "re4", "温": "wen1",
    "凉": "liang2", "干": "gan1", "湿": "shi1", "净": "jing4", "脏": "zang1",
    "满": "man3", "破": "po4", "整": "zheng3", "全": "quan2", "共": "gong4",
    "单": "dan1", "双": "shuang1", "内": "nei4", "表": "biao3", "主": "zhu3",
    "客": "ke4", "送": "song4", "接": "jie1", "找": "zhao3", "丢": "diu1",
    "带": "dai4", "穿": "chuan1", "脱": "tuo1", "洗": "xi3", "切": "qie1",
    "条": "tiao2", "张": "zhang1", "只": "zhi3", "块": "kuai4", "份": "fen4",
    "群": "qun2", "双": "shuang1", "克": "ke4", "斤": "jin1", "尺": "chi3",
    "寸": "cun4", "元": "yuan2", "角": "jiao3", "毛": "mao2", "啦": "la5",
    "哈": "ha1", "嘿": "hei1", "喂": "wei4", "嗯": "en4", "唉": "ai4",
    "哎": "ai1", "呵": "he1", "嘻": "xi1", "哟": "yo5", "呗": "bei5",
    "咱": "zan2", "您": "nin2", "俩": "lia3", "仨": "sa1", "自": "zi4",
    "己": "ji3", "别": "bie2", "人": "ren2", "咋": "za3", "啥": "sha2",
    "处": "chu4", "办": "ban4", "法": "fa3", "情": "qing2", "意": "yi4",
    "思": "si1", "感": "gan3", "受": "shou4", "认": "ren4", "识": "shi2",
    "记": "ji4", "忘": "wang4", "信": "xin4", "望": "wang4", "希": "xi1",
    "期": "qi1", "待": "dai4", "需": "xu1", "求": "qiu2", "助": "zhu4",
    "帮": "bang1", "谢": "xie4", "请": "qing3", "祝": "zhu4", "愿": "yuan4",
    "将": "jiang1", "相": "xiang1", "教": "jiao1", "应": "ying1", "便": "bian4",
    "空": "kong1", "干": "gan1", "调": "diao4", "都": "dou1", "还": "hai2",
}


def load_word_dict() -> dict[str, list[str]]:
    with open(os.path.join(REF, "g2pw", "polyphonic.pickle"), "rb") as f:
        raw = pickle.load(f)
    words = {}
    for w, pys in raw.items():
        pys = list(pys)
        if len(pys) == len(w) and all(re.fullmatch(r"[a-z]+[1-5]", p) for p in pys):
            words[w] = pys
    return words


def load_jieba_freqs() -> dict[str, int]:
    import jieba

    freqs: dict[str, int] = {}
    with open(os.path.join(os.path.dirname(jieba.__file__), "dict.txt"), encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                freqs[parts[0]] = int(parts[1])
    return freqs


def derive_char_defaults(words: dict[str, list[str]], freqs: dict[str, int]) -> dict[str, str]:
    votes: dict[str, Counter] = defaultdict(Counter)
    for w, pys in words.items():
        weight = freqs.get(w, 1) + 1
        for ch, py in zip(w, pys):
            votes[ch][py] += weight
    chars = {ch: c.most_common(1)[0][0] for ch, c in votes.items()}
    chars.update(CHAR_OVERRIDES)
    return chars


def load_t2s() -> tuple[str, str]:
    """Extract the two aligned char strings from the reference table."""
    src = open(os.path.join(REF, "zh_normalization", "char_convert.py"), encoding="utf-8").read()
    simp = re.search(r'simplified_charcters = "(.*?)"\n', src, re.S).group(1)
    trad = re.search(r'traditional_characters = "(.*?)"\n', src, re.S).group(1)
    assert len(simp) == len(trad), (len(simp), len(trad))
    return trad, simp


def main():
    os.makedirs(OUT, exist_ok=True)
    words = load_word_dict()
    freqs = load_jieba_freqs()
    chars = derive_char_defaults(words, freqs)
    print(f"words: {len(words)}  chars: {len(chars)}")
    with gzip.open(os.path.join(OUT, "zh_pinyin.json.gz"), "wt", encoding="utf-8") as f:
        json.dump({"words": words, "chars": chars}, f, ensure_ascii=False, separators=(",", ":"))

    trad, simp = load_t2s()
    print(f"t2s pairs: {len(trad)}")
    with gzip.open(os.path.join(OUT, "zh_t2s.json.gz"), "wt", encoding="utf-8") as f:
        json.dump({"trad": trad, "simp": simp}, f, ensure_ascii=False, separators=(",", ":"))

    # pinyin syllable -> (initial-symbol, final-symbol) — the v2 phone
    # inventory convention (reference text/opencpop-strict.txt, the table
    # chinese2.py:15-18 keys every syllable through)
    table = {}
    with open(os.path.join(REF, "opencpop-strict.txt"), encoding="utf-8") as f:
        for line in f:
            syl, symbols = line.rstrip("\n").split("\t")
            table[syl] = symbols.split(" ")
    print(f"pinyin syllables: {len(table)}")
    with gzip.open(os.path.join(OUT, "zh_pinyin_symbols.json.gz"), "wt", encoding="utf-8") as f:
        json.dump(table, f, ensure_ascii=False, separators=(",", ":"))


if __name__ == "__main__":
    sys.exit(main())
