"""Generate the built-in Cantonese (yue) jyutping lexicon.

The reference's cantonese.py uses the ToJyutping package (external data),
which is not installable in this environment. This script embeds a
hand-curated frequent-hanzi jyutping table (linguistic data, standard
jyutping romanization with tones 1-6) plus word-level entries for common
polyphones (銀行 ngan4 hong4 vs 行路 haang4 lou6) and Cantonese-specific
vocabulary (唔/嘅/喺/佢...). Keys cover both simplified and traditional
forms because the shared zh TN pass simplifies characters first, while
user text may carry traditional forms through untouched.

Output (committed): gpt_sovits_tpu/text/data/yue_jyutping.json.gz
Run:  python scripts/gen_yue_data.py
"""

from __future__ import annotations

import gzip
import json
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "gpt_sovits_tpu", "text", "data")

# "char reading" per line; variants separated by "/" share the reading
CHAR_TABLE = """
我 ngo5
你 nei5
佢 keoi5
他 taa1
她 taa1
它 taa1
哋 dei6
們/们 mun4
的 dik1
是 si6
係 hai6
系 hai6
唔 m4
不 bat1
了 liu5
咗 zo2
在 zoi6
喺 hai2
有 jau5
冇 mou5
無/无 mou4
人 jan4
呢 ni1
嗰 go2
嘅 ge3
㗎 gaa3
啦 laa1
啩 gwaa3
咋 zaa3
啫 ze1
嘞 laak3
吓 haa2
咦 ji2
這/这 ze2
那 naa5
個/个 go3
啲 di1
中 zung1
大 daai6
小 siu2
上 soeng6
下 haa6
來/来 loi4
嚟 lai4
去 heoi3
到 dou3
說/说 syut3
講/讲 gong2
話/话 waa6
好 hou2
很 han2
都 dou1
會/会 wui5
要 jiu3
就 zau6
同 tung4
和 wo4
與/与 jyu5
也 jaa5
還/还 waan4
仲 zung6
沒/没 mut6
能 nang4
可 ho2
以 ji5
什 sam6
麼/么 mo1
乜 mat1
嘢 je5
點/点 dim2
樣/样 joeng6
做 zou6
想 soeng2
知 zi1
道 dou6
得 dak1
地 dei6
方 fong1
時/时 si4
間/间 gaan1
年 nin4
月 jyut6
日 jat6
天 tin1
今 gam1
明 ming4
昨 zok6
早 zou2
晚 maan5
夜 je6
朝 ziu1
午 ng5
家 gaa1
屋 uk1
企 kei5
學/学 hok6
校 haau6
生 sang1
先 sin1
老 lou5
師/师 si1
朋 pang4
友 jau5
愛/爱 oi3
鍾/钟 zung1
意 ji3
心 sam1
手 sau2
口 hau2
眼 ngaan5
耳 ji5
鼻 bei6
頭/头 tau4
髮/发 faat3
面 min6
腳/脚 goek3
身 san1
體/体 tai2
食 sik6
飲/饮 jam2
水 seoi2
茶 caa4
飯/饭 faan6
菜 coi3
肉 juk6
魚/鱼 jyu4
雞/鸡 gai1
牛 ngau4
豬/猪 zyu1
羊 joeng4
蛋 daan2
米 mai5
麵/面 min6
包 baau1
糖 tong4
鹽/盐 jim4
油 jau4
酒 zau2
奶 naai5
果 gwo2
瓜 gwaa1
買/买 maai5
賣/卖 maai6
錢/钱 cin2
銀/银 ngan4
貴/贵 gwai3
平 ping4
宜 ji4
多 do1
少 siu2
幾/几 gei2
百 baak3
千 cin1
萬/万 maan6
億/亿 jik1
零 ling4
〇 ling4
一 jat1
二 ji6
三 saam1
四 sei3
五 ng5
六 luk6
七 cat1
八 baat3
九 gau2
十 sap6
兩/两 loeng5
半 bun3
第 dai6
號/号 hou6
電/电 din6
腦/脑 nou5
視/视 si6
影 jing2
相 soeng1
機/机 gei1
車/车 ce1
船 syun4
飛/飞 fei1
場/场 coeng4
站 zaam6
港 gong2
鐵/铁 tit3
巴 baa1
士 si6
的士 dik1 si6-2
路 lou6
街 gaai1
市 si5
城 sing4
店 dim3
鋪/铺 pou3
房 fong4
門/门 mun4
窗 coeng1
床 cong4
檯/台 toi4
櫈/凳 dang3
椅 ji2
書/书 syu1
紙/纸 zi2
筆/笔 bat1
字 zi6
畫/画 waa2
音 jam1
樂/乐 lok6
歌 go1
唱 coeng3
跳 tiu3
舞 mou5
行 hang4
走 zau2
跑 paau2
坐 co5
睡 seoi6
瞓 fan3
醒 sing2
開/开 hoi1
關/关 gwaan1
收 sau1
放 fong3
攞 lo2
拿 naa4
畀 bei2
俾 bei2
送 sung3
接 zip3
打 daa2
搵 wan2
揾 wan2
搬 bun1
洗 sai2
著 zoek6
着 zoek6
睇 tai2
聽/听 ting1
讀/读 duk6
寫/写 se2
教 gaau3
問/问 man6
答 daap3
識/识 sik1
懂 dung2
記/记 gei3
忘 mong4
諗 nam2
覺/觉 gok3
見/见 gin3
望 mong6
叫 giu3
笑 siu3
喊 haam3
驚/惊 geng1
怕 paa3
嬲 nau1
開心 hoi1 sam1
快 faai3
慢 maan6
新 san1
舊/旧 gau6
高 gou1
矮 ai2
長/长 coeng4
短 dyun2
肥 fei4
瘦 sau3
靚/靓 leng3
醜/丑 cau2
光 gwong1
暗 am3
凍/冻 dung3
熱/热 jit6
暖 nyun5
涼/凉 loeng4
乾/干 gon1
濕/湿 sap1
白 baak6
黑 hak1
紅/红 hung4
黃/黄 wong4
藍/蓝 laam4
綠/绿 luk6
青 cing1
紫 zi2
灰 fui1
色 sik1
花 faa1
草 cou2
樹/树 syu6
葉/叶 jip6
山 saan1
海 hoi2
河 ho4
江 gong1
湖 wu4
島/岛 dou2
石 sek6
沙 saa1
泥 nai4
風/风 fung1
雨 jyu5
雪 syut3
雲/云 wan4
雷 leoi4
星 sing1
空 hung1
氣/气 hei3
火 fo2
土 tou2
金 gam1
木 muk6
狗 gau2
貓/猫 maau1
鳥/鸟 niu5
雀 zoek3
蟲/虫 cung4
馬/马 maa5
象 zoeng6
獅/狮 si1
虎 fu2
龍/龙 lung4
蛇 se4
國/国 gwok3
省 saang2
縣/县 jyun6
區/区 keoi1
香 hoeng1
澳 ou3
灣/湾 waan1
州 zau1
京 ging1
政 zing3
府 fu2
公 gung1
司 si1
工 gung1
作 zok3
職/职 zik1
業/业 jip6
商 soeng1
農/农 nung4
醫/医 ji1
院 jyun2
病 beng6
藥/药 joek6
痛 tung3
死 sei2
活 wut6
命 meng6
歲/岁 seoi3
婚 fan1
禮/礼 lai5
節/节 zit3
假 gaa3
期 kei4
週/周 zau1
禮拜 lai5 baai3
父 fu6
母 mou5
爸 baa4
媽/妈 maa1
哥 go1
姐 ze2
妹 mui6
弟 dai6
仔 zai2
女 neoi5
男 naam4
囡 neoi2
孫/孙 syun1
公婆 gung1 po4
婆 po4
爺/爷 je4
嫲 maa4
舅 kau5
姨 ji1
叔 suk1
伯 baak3
夫 fu1
妻 cai1
結/结 git3
離/离 lei4
分 fan1
合 hap6
加 gaa1
減/减 gaam2
乘 sing4
除 ceoi4
等 dang2
於/于 jyu1
因 jan1
為/为 wai4
所 so2
但 daan6
而 ji4
或 waak6
如 jyu4
果然 gwo2 jin4
若 joek6
雖/虽 seoi1
然 jin4
之 zi1
其 kei4
者 ze2
又 jau6
再 zoi3
最 zeoi3
更 gang3
太 taai3
真 zan1
假話 gaa2 waa6
先至 sin1 zi3
至 zi3
已 ji5
經/经 ging1
曾 cang4
將/将 zoeng1
正 zing3
啱 ngaam1
錯/错 co3
對/对 deoi3
啊 aa3
呀 aa4
喇 laa3
囉/啰 lo1
嘛 maa3
咩 me1
吖 aa1
喎 wo3
噃 bo3
添 tim1
喂 wai3
哦 o4
嗯 ng6
嘩/哗 waa1
哎 aai1
唉 aai1
請/请 cing2
謝/谢 ze6
晒 saai3
啱啱 ngaam1 ngaam1
慢慢 maan6 maan2
入 jap6
出 ceot1
返 faan1
番 faan1
過/过 gwo3
落 lok6
起 hei2
住 zyu6
向 hoeng3
從/从 cung4
離開 lei4 hoi1
邊/边 bin1
度 dou6
處/处 cyu3
外 ngoi6
內/内 noi6
裏/里 leoi5
旁 pong4
隔 gaak3
籬/篱 lei4
前 cin4
後/后 hau6
左 zo2
右 jau6
東/东 dung1
南 naam4
西 sai1
北 bak1
近 kan5
遠/远 jyun5
直 zik6
橫/横 waang4
斜 ce4
圓/圆 jyun4
正方 zing3 fong1
件 gin6
隻/只 zek3
條/条 tiu4
張/张 zoeng1
本 bun2
部 bou6
層/层 cang4
樓/楼 lau4
杯 bui1
碗 wun2
碟 dip6
樽 zeon1
枝 zi1
把 baa2
袋 doi6
箱 soeng1
磅 bong6
斤 gan1
克 hak1
升 sing1
里 lei5
尺 cek3
寸 cyun3
秒 miu5
鐘/钟 zung1
點鐘 dim2 zung1
刻 hak1
次 ci3
遍 pin3
趟 tong3
回 wui4
聲/声 sing1
語/语 jyu5
文 man4
英 jing1
法 faat3
德 dak1
俄 ngo4
韓/韩 hon4
泰 taai3
越 jyut6
普 pou2
通 tung1
報/报 bou3
紙張 zi2 zoeng1
網/网 mong5
站台 zaam6 toi4
信 seon3
郵/邮 jau4
寄 gei3
傳/传 cyun4
真相 zan1 soeng3
消 siu1
息 sik1
新聞 san1 man4
聞/闻 man4
事 si6
情 cing4
問題 man6 tai4
題/题 tai4
辦/办 baan6
理 lei5
管 gun2
查 caa4
證/证 zing3
據/据 geoi3
料 liu6
資/资 zi1
錄/录 luk6
號碼 hou6 maa5
碼/码 maa5
密 mat6
保 bou2
安 on1
全 cyun4
危 ngai4
險/险 him2
警 ging2
察 caat3
兵 bing1
軍/军 gwan1
戰/战 zin3
爭/争 zang1
勝/胜 sing3
負/负 fu6
輸/输 syu1
贏/赢 jeng4
比 bei2
賽/赛 coi3
波 bo1
球 kau4
泳 wing6
運/运 wan6
動/动 dung6
練/练 lin6
習/习 zaap6
考 haau2
試/试 si3
成 sing4
績/绩 zik1
班 baan1
級/级 kap1
課/课 fo3
堂 tong4
歷/历 lik6
史 si2
數/数 sou3
科 fo1
化 faa3
物 mat6
晴 cing4
陰/阴 jam1
曇/昙 taam4
預/预 jyu6
溫/温 wan1
低 dai1
熱度 jit6 dou6
冷 laang5
春 ceon1
夏 haa6
秋 cau1
冬 dung1
季 gwai3
休 jau1
玩 waan2
遊/游 jau4
旅 leoi5
程 cing4
票 piu3
簽/签 cim1
住宿 zyu6 suk1
酒店 zau2 dim3
餐 caan1
廳/厅 teng1
廁/厕 ci3
浴 juk6
梳 so1
鏡/镜 geng3
毛 mou4
巾 gan1
衫 saam1
褲/裤 fu3
裙 kwan4
鞋 haai4
襪/袜 mat6
帽 mou2
錶/表 biu1
戒 gaai3
指 zi2
環/环 waan4
頸/颈 geng2
鏈/链 lin2
遮 ze1
匙 si4
鎖/锁 so2
燈/灯 dang1
掣 zai3
制 zai3
爐/炉 lou4
鑊/镬 wok6
煲 bou1
煮 zyu2
炒 caau2
蒸 zing1
炸 zaa3
焗 guk6
烚 saap6
切 cit3
刀 dou1
叉 caa1
羹 gang1
筷 faai3
飽/饱 baau2
餓/饿 ngo6
渴 hot3
味 mei6
甜 tim4
酸 syun1
苦 fu2
辣 laat6
鹹/咸 haam4
淡 taam5
香味 hoeng1 mei6
臭 cau3
乾淨 gon1 zeng6
淨/净 zing6
污 wu1
糟 zou1
亂/乱 lyun6
齊/齐 cai4
整 zing2
修 sau1
換/换 wun6
壞/坏 waai6
爛/烂 laan6
補/补 bou2
造 zou6
建 gin3
拆 caak3
搭 daap3
載/载 zoi3
泊 paak3
揸 zaa1
駛/驶 sai2
快車 faai3 ce1
慢車 maan6 ce1
飛機 fei1 gei1
巴士 baa1 si6-2
單/单 daan1
雙/双 soeng1
對面 deoi3 min6
"""

# word-level entries: polyphones and multi-char items whose reading is not
# the concatenation of the char defaults
WORD_TABLE = """
銀行 ngan4 hong4
银行 ngan4 hong4
行路 haang4 lou6
行街 haang4 gaai1
行山 haang4 saan1
行為 hang4 wai4
行为 hang4 wai4
自行 zi6 hang4
音樂 jam1 ngok6
音乐 jam1 ngok6
快樂 faai3 lok6
快乐 faai3 lok6
覺得 gok3 dak1
觉得 gok3 dak1
瞓覺 fan3 gaau3
睡覺 seoi6 gaau3
睡觉 seoi6 gaau3
重要 zung6 jiu3
重複 cung4 fuk1
重复 cung4 fuk1
好重 hou2 cung5
長大 zoeng2 daai6
长大 zoeng2 daai6
校長 haau6 zoeng2
校长 haau6 zoeng2
長度 coeng4 dou6
长度 coeng4 dou6
便宜 pin4 ji4
方便 fong1 bin6
大便 daai6 bin6
唔使 m4 sai2
使用 si2 jung6
大使 daai6 si3
會計 wui6 gai3
会计 wui6 gai3
開會 hoi1 wui6-2
开会 hoi1 wui6-2
地下 dei6 haa6-2
下面 haa6 min6
電話 din6 waa6-2
电话 din6 waa6-2
說話 syut3 waa6
说话 syut3 waa6
廣東話 gwong2 dung1 waa6-2
广东话 gwong2 dung1 waa6-2
中國 zung1 gwok3
中国 zung1 gwok3
香港 hoeng1 gong2
九龍 gau2 lung4
九龙 gau2 lung4
新界 san1 gaai3
平靚正 peng4 leng3 zeng3
好平 hou2 peng4
平時 ping4 si4
平时 ping4 si4
和平 wo4 ping4
差唔多 caa1 m4 do1
差錯 caa1 co3
差错 caa1 co3
郵差 jau4 caai1
邮差 jau4 caai1
出差 ceot1 caai1
差人 caai1 jan4
時差 si4 caa1
时差 si4 caa1
好差 hou2 caa1
打得 daa2 dak1
唔得 m4 dak1
得閒 dak1 haan4
得闲 dak1 haan4
乜嘢 mat1 je5
咩嘢 me1 je5
點解 dim2 gaai2
点解 dim2 gaai2
點樣 dim2 joeng6-2
点样 dim2 joeng6-2
而家 ji4 gaa1
宜家 ji4 gaa1
今日 gam1 jat6
聽日 ting1 jat6
听日 ting1 jat6
琴日 kam4 jat6
尋日 cam4 jat6
寻日 cam4 jat6
今朝 gam1 ziu1
今晚 gam1 maan5-1
晏晝 ngaan3 zau3
晏昼 ngaan3 zau3
夜晚 je6 maan5-1
上晝 soeng6 zau3
上昼 soeng6 zau3
下晝 haa6 zau3
下昼 haa6 zau3
星期 sing1 kei4
禮拜 lai5 baai3
礼拜 lai5 baai3
幾多 gei2 do1
几多 gei2 do1
幾時 gei2 si4
几时 gei2 si4
邊度 bin1 dou6
边度 bin1 dou6
邊個 bin1 go3
边个 bin1 go3
呢度 ni1 dou6
嗰度 go2 dou6
呢個 ni1 go3
呢个 ni1 go3
嗰個 go2 go3
嗰个 go2 go3
多謝 do1 ze6
多谢 do1 ze6
唔該 m4 goi1
唔该 m4 goi1
唔好 m4 hou2
好唔好 hou2 m4 hou2
係唔係 hai6 m4 hai6
系唔系 hai6 m4 hai6
唔係 m4 hai6
唔系 m4 hai6
唔知 m4 zi1
唔想 m4 soeng2
唔怪 m4 gwaai3
對唔住 deoi3 m4 zyu6
对唔住 deoi3 m4 zyu6
冇問題 mou5 man6 tai4
冇问题 mou5 man6 tai4
有冇 jau5 mou5
乜都 mat1 dou1
好耐 hou2 noi6
耐 noi6
後生 hau6 saang1
后生 hau6 saang1
先生 sin1 saang1
醫生 ji1 sang1
医生 ji1 sang1
學生 hok6 saang1
学生 hok6 saang1
生日 saang1 jat6
生活 sang1 wut6
出生 ceot1 sang1
花生 faa1 sang1
生意 saang1 ji3
返工 faan1 gung1
收工 sau1 gung1
返學 faan1 hok6
返学 faan1 hok6
放學 fong3 hok6
放学 fong3 hok6
食飯 sik6 faan6
食饭 sik6 faan6
飲茶 jam2 caa4
饮茶 jam2 caa4
飲水 jam2 seoi2
饮水 jam2 seoi2
買嘢 maai5 je5
买嘢 maai5 je5
食嘢 sik6 je5
睇戲 tai2 hei3
睇戏 tai2 hei3
睇書 tai2 syu1
睇书 tai2 syu1
睇電視 tai2 din6 si6
睇电视 tai2 din6 si6
打波 daa2 bo1
游水 jau4 seoi2
跑步 paau2 bou6
唱歌 coeng3 go1
跳舞 tiu3 mou5
影相 jing2 soeng3-2
相片 soeng3-2 pin3-2
相信 soeng1 seon3
互相 wu6 soeng1
首相 sau2 soeng3
樣衰 joeng6-2 seoi1
咁樣 gam2 joeng6-2
咁样 gam2 joeng6-2
咁 gam3
噉 gam2
就嚟 zau6 lai4
返嚟 faan1 lai4
入嚟 jap6 lai4
出嚟 ceot1 lai4
攞嚟 lo2 lai4
俾錢 bei2 cin2
畀錢 bei2 cin2
找錢 zaau2 cin2
找数 zaau2 sou3
搵錢 wan2 cin2-2
搵工 wan2 gung1
鍾意 zung1 ji3
聽歌 teng1 go1
听歌 teng1 go1
好聽 hou2 teng1
好听 hou2 teng1
聽講 teng1 gong2
听讲 teng1 gong2
大聲 daai6 seng1
大声 daai6 seng1
細聲 sai3 seng1
细声 sai3 seng1
钟意 zung1 ji3
中意 zung1 ji3
注意 zyu3 ji3
生意人 saang1 ji3 jan4
意思 ji3 si1
思考 si1 haau2
返屋企 faan1 uk1 kei5-2
屋企 uk1 kei5-2
企業 kei5 jip6
企业 kei5 jip6
"""


def _parse(table: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for line in table.strip().splitlines():
        parts = line.split()
        keys, reading = parts[0], " ".join(parts[1:])
        # changed-tone notation "waa6-2" -> surface tone (the part after -)
        sylls = []
        for s in reading.split():
            if "-" in s:
                base, changed = s.split("-")
                s = base.rstrip("123456") + changed
            sylls.append(s)
        reading = " ".join(sylls)
        for key in keys.split("/"):
            out[key] = reading
    return out


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    chars_raw = _parse(CHAR_TABLE)
    words_raw = _parse(WORD_TABLE)
    # multi-char lines in CHAR_TABLE are really word entries
    chars = {k: v for k, v in chars_raw.items() if len(k) == 1}
    words = {k: v for k, v in chars_raw.items() if len(k) > 1}
    words.update(words_raw)
    # the shared zh TN pass simplifies hanzi before g2p: derive a
    # simplified-form key for every traditional word entry
    with gzip.open(os.path.join(OUT, "zh_t2s.json.gz"), "rt", encoding="utf-8") as f:
        t2s_tab = json.load(f)
    t2s = dict(zip(t2s_tab["trad"], t2s_tab["simp"]))
    for k, v in list(words.items()):
        simp = "".join(t2s.get(c, c) for c in k)
        words.setdefault(simp, v)
    for k, v in list(chars.items()):
        simp = t2s.get(k, k)
        chars.setdefault(simp, v)
    blob = {"chars": chars, "words": words}
    path = os.path.join(OUT, "yue_jyutping.json.gz")
    with gzip.open(path, "wt", encoding="utf-8") as f:
        json.dump(blob, f, ensure_ascii=False, separators=(",", ":"))
    print(f"wrote {path}: {len(chars)} chars, {len(words)} words")


if __name__ == "__main__":
    main()
