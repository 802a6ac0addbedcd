"""Golden parity: gpt_sovits_tpu.text.zh_norm vs the reference's
zh_normalization.TextNormalizer on a TN-heavy corpus.

The reference TN package is pure-regex Python except for a single
`pypinyin.constants.SUPPORT_UCS4` flag import; a two-line stub makes it
loadable as an oracle without pypinyin (which this image does not have)."""

import sys
import types

import pytest

REF_PKG = "/root/reference/GPT_SoVITS"


@pytest.fixture(scope="module")
def ref_tn():
    if "pypinyin" not in sys.modules:
        pp = types.ModuleType("pypinyin")
        const = types.ModuleType("pypinyin.constants")
        const.SUPPORT_UCS4 = True
        pp.constants = const
        sys.modules["pypinyin"] = pp
        sys.modules["pypinyin.constants"] = const
    if REF_PKG not in sys.path:
        sys.path.insert(0, REF_PKG)
    from text.zh_normalization import TextNormalizer

    return TextNormalizer()


# TN-heavy corpus: dates, clock times + ranges, temperature, measures,
# money, phones (mobile / landline / 400), fractions, percent, ranges,
# negatives, versions, quantifiers, serials, math, traditional chars,
# full-width forms, greek letters, circled digits
CORPUS = [
    "2024年3月5日，我花了3.5万元买了台电脑。",
    "今天是2002/09/01，也写作2002-09-01或2002.09.01。",
    "95年8月23号下午3:30开会，预计5:45:30结束。",
    "会议时间是8:30-12:30，下半场14:00~17:05。",
    "今天气温-3℃到5℃，水温25.5°C，体感-7度。",
    "全长3cm，面积12cm2，体积7cm3，重量60kg，距离42km。",
    "他买了3m2的地毯、0.5ml的香水和100mm的螺丝。",
    "我的手机号是13812345678，座机是010-62345678。",
    "客服电话4008123456，也可拨打400-812-3456。",
    "上海的区号是021，电话02187654321。",
    "成功率达95.5%，失败率只有-0.5%。",
    "三分之二写作2/3，负四分之三写作-3/4。",
    "今年增长3~5个百分点，价格在100-200元之间。",
    "温度从-10~-5度回升。",
    "零点五是0.5，点二五是.25，一百点零三是100.30。",
    "编号00078，房间号1203，密码123456。",
    "他排第3名，买了2个苹果，3只猫和10头牛。",
    "一共2人，3位老师，4名学生，5条狗。",
    "软件版本是2.0.1，内核版本5.15.0.3。",
    "计算：1+2=3，6÷2=3，2×3=6，10-4=6。",
    "x²+y²=z²，2³等于8，10ⁿ次方很大。",
    "這是繁體中文測試，包含電腦和網絡。",
    "全角数字１２３和全角字母ＡＢＣ。",
    "α粒子和β射线，圆周率π约等于3.14。",
    "序号①②③表示第一二三项。",
    "他1997年出生，今年27岁，身高1.75米。",
    "这辆车百公里油耗7.5L，售价15.98万元。",
    "比赛比分是3比2，胜率66.7%。",
    "第1章有20页，第2章有35页。",
    "股价下跌-5.5%，市值缩水2000万。",
    "火车G1024次3:05发车。",
    "他体重75kg，体温37.2度。",
    "预算是50万元，实际花费48.6万元。",
    "距离目标还有0.8km，大约10分钟路程。",
    "2月14日情人节，12月25日圣诞节。",
    "21年3月，欢迎致电400-888-9999。",
    "房贷利率4.9%，存款利率1.75%。",
    "这块地有2.5亩，产量1000斤。",
    "他跑了42.195km，用时3:59:59。",
    "电压220V变成110V。",
    "温度范围是-40~85度。",
    "圆的面积是πr²。",
    "今天股市涨了120点，成交量3.2亿。",
    "快递单号是785412369852。",
    "屋里有3张桌子、12把椅子和1盏灯。",
    "水费2.6元每吨，电费0.52元每度。",
    "1斤等于500克，1千克等于2斤。",
    "他的学号是2021302058。",
    "现在是13:00整，14:30有课。",
    "书有380页，我读到第156页。",
    "这栋楼高99.9米，共33层。",
    "售价￥1999，优惠价￥1599。",
    "增值税税率13%，个税起征点5000元。",
    "面积约120m2的房子售价680万。",
    "考试满分150分，他得了128.5分。",
    "10005个零件，100200只箱子。",
    "一十一是11，一百一十是110。",
    "3.20元和3.00元是不同的写法。",
    "他住在2单元402室。",
    "11月11日是购物节，0点开抢。",
]


def test_normalize_matches_reference(ref_tn):
    from gpt_sovits_tpu.text.zh_norm import normalize_sentences

    mismatches = []
    for text in CORPUS:
        want = ref_tn.normalize(text)
        got = normalize_sentences(text)
        if got != want:
            mismatches.append((text, want, got))
    assert not mismatches, "\n".join(
        f"IN:   {t}\nWANT: {w}\nGOT:  {g}\n" for t, w, g in mismatches
    )


def test_verbalizers_match_reference(ref_tn):
    """Pin the number grammar itself across magnitudes and forms."""
    sys.path.insert(0, REF_PKG)
    from text.zh_normalization.num import num2str as ref_num2str
    from text.zh_normalization.num import verbalize_cardinal as ref_cardinal
    from text.zh_normalization.num import verbalize_digit as ref_digit

    from gpt_sovits_tpu.text.zh_norm import num2str, verbalize_cardinal, verbalize_digits

    cases = [
        "0", "5", "10", "11", "19", "20", "105", "110", "119", "200", "999",
        "1000", "1001", "1010", "1100", "9999", "10000", "10005", "10050",
        "100200", "1000000", "10000005", "100000000", "100000001",
        "120000000000", "00078", "007",
    ]
    for c in cases:
        assert verbalize_cardinal(c) == ref_cardinal(c), c
        assert verbalize_digits(c) == ref_digit(c), c
        assert verbalize_digits(c, alt_one=True) == ref_digit(c, alt_one=True), c
    for c in ["0.5", "3.20", "3.00", "100.30", "1.75", "42.195", "0.001", "3.14159"]:
        assert num2str(c) == ref_num2str(c), c


def test_t2s_matches_reference(ref_tn):
    from text.zh_normalization.char_convert import tranditional_to_simplified as ref_t2s

    from gpt_sovits_tpu.text.zh_norm import traditional_to_simplified

    samples = [
        "一般是指存取一個應用程式啟動時始終顯示的網頁",
        "這是繁體中文測試，包含電腦和網絡。",
        "愛過麼？讓我們蕩起雙槳",
    ]
    for s in samples:
        assert traditional_to_simplified(s) == ref_t2s(s), s
