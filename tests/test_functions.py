

class TestNumFmtPositional:
    """formatting.c NUM_processor edge forms (int8.out to_char_5..17):
    the positional renderer pg_num_fmt."""

    def test_sign_and_ordinals(self):
        from gpdb_spark.functions.pg_numeric_agg import pg_num_fmt

        assert pg_num_fmt(456, "MI9999999999999999") \
            == "              456"
        assert pg_num_fmt(-4567890123456789, "MI9999999999999999") \
            == "-4567890123456789"
        assert pg_num_fmt(456, "FMS9999999999999999") == "+456"
        assert pg_num_fmt(123, "FM9999999999999999THPR") == "123RD"
        assert pg_num_fmt(-4567890123456789,
                          "FM9999999999999999THPR") \
            == "<4567890123456789>"
        assert pg_num_fmt(456, "SG9999999999999999th") \
            == "+             456th"
        assert pg_num_fmt(456, "999999SG9999999999") \
            == "      +       456"

    def test_zero_fill_and_decimals(self):
        from gpdb_spark.functions.pg_numeric_agg import pg_num_fmt

        assert pg_num_fmt(456, "0999999999999999") \
            == " 0000000000000456"
        assert pg_num_fmt(456, "S0999999999999999") \
            == "+0000000000000456"
        # FM keeps zeros in '0' decimal slots, strips '9' slots
        assert pg_num_fmt(456, "FM9999999999999999.000") == "456.000"
        assert pg_num_fmt(456, "FM9999999999999999.999") == "456."
        # C-locale L: one slot space, no symbol
        assert pg_num_fmt(456, "L9999999999999999.000") \
            == "               456.000"

    def test_spaced_digits_and_quoted_text(self):
        from gpdb_spark.functions.pg_numeric_agg import pg_num_fmt

        assert pg_num_fmt(
            456, "S 9 9 9 9 9 9 9 9 9 9 9 9 9 9 9 9 . 9 9 9") \
            == "                           +4 5 6 . 0 0 0"
        assert pg_num_fmt(
            456,
            '99999 "text" 9999 "9999" 999'
            ' "\\"text between quote marks\\"" 9999') \
            == '      text      9999     "text between quote' \
               ' marks"   456'


class TestNumericTextArith:
    """numeric.c exact arithmetic over text operands
    (pg_numeric_bin/pg_numeric_cmp — the numeric.sql 210-digit
    surface)."""

    def test_bin_scales(self):
        from gpdb_spark.functions.pg_numeric_agg import pg_numeric_bin

        assert pg_numeric_bin("add", "1.50", "2.5") == "4.00"
        assert pg_numeric_bin("sub", "1.50", "2.5") == "-1.00"
        assert pg_numeric_bin("mul", "1.5", "2.50") == "3.750"
        assert pg_numeric_bin("div", "1", "3") \
            == "0.33333333333333333333"
        assert pg_numeric_bin("round", "2.5", "0") == "3"
        assert pg_numeric_bin("round", "-2.5", "0") == "-3"
        assert pg_numeric_bin("abs", "-4.20") == "4.20"
        assert pg_numeric_bin("sqrt", "2") == "1.414213562373095"
        big = "9" * 88
        got = pg_numeric_bin("mul", big, big)
        assert len(got) == 176 and got.startswith("99999999")

    def test_cmp(self):
        from gpdb_spark.functions.pg_numeric_agg import pg_numeric_cmp

        assert pg_numeric_cmp("1.50", "1.5") == 0
        assert pg_numeric_cmp("-2", "1") == -1
        assert pg_numeric_cmp("NaN", "NaN") == 0
        assert pg_numeric_cmp("NaN", "1e100") == 1
