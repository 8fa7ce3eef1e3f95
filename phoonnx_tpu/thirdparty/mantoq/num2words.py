"""Arabic number verbalization for the mantoq pipeline."""


_ONES = [
    "صفر", "واحد", "اثنان", "ثلاثة", "أربعة", "خمسة", "ستة", "سبعة",
    "ثمانية", "تسعة", "عشرة", "أحد عشر", "اثنا عشر", "ثلاثة عشر",
    "أربعة عشر", "خمسة عشر", "ستة عشر", "سبعة عشر", "ثمانية عشر",
    "تسعة عشر",
]
_TENS = ["", "", "عشرون", "ثلاثون", "أربعون", "خمسون", "ستون", "سبعون",
         "ثمانون", "تسعون"]
_HUNDREDS = ["", "مائة", "مائتان", "ثلاثمائة", "أربعمائة", "خمسمائة",
             "ستمائة", "سبعمائة", "ثمانمائة", "تسعمائة"]


def _int_to_words(n: int) -> str:
    if n < 0:
        return "سالب " + _int_to_words(-n)
    if n < 20:
        return _ONES[n]
    if n < 100:
        tens, ones = divmod(n, 10)
        if ones:
            return _ONES[ones] + " و" + _TENS[tens]
        return _TENS[tens]
    if n < 1000:
        hundreds, rest = divmod(n, 100)
        head = _HUNDREDS[hundreds]
        return head + (" و" + _int_to_words(rest) if rest else "")
    if n < 10 ** 6:
        thousands, rest = divmod(n, 1000)
        if thousands == 1:
            head = "ألف"
        elif thousands == 2:
            head = "ألفان"
        elif thousands <= 10:
            head = _int_to_words(thousands) + " آلاف"
        else:
            head = _int_to_words(thousands) + " ألف"
        return head + (" و" + _int_to_words(rest) if rest else "")
    millions, rest = divmod(n, 10 ** 6)
    head = ("مليون" if millions == 1
            else _int_to_words(millions) + " مليون")
    return head + (" و" + _int_to_words(rest) if rest else "")


def arabic_num2words(number: str) -> str:
    """Digit string (possibly decimal) -> Arabic words."""
    number = number.replace(",", ".")
    if "." in number:
        int_part, frac_part = number.split(".", 1)
        frac_words = " ".join(
            _ONES[int(d)] for d in frac_part if d.isdigit()
        )
        return _int_to_words(int(int_part or 0)) + " فاصلة " + frac_words
    return _int_to_words(int(number))
