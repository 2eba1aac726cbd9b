"""Golden fixture corpus ported from the reference Go test suite.

Each entry is ``(input_text, [expected_json_strings_in_callback_order])``
— data transcribed from /root/reference/reader_test.go:220-729 (testData).
The two StackOverflow cases with ~900-element graphData arrays are
represented structurally (same constructs, shorter arrays) as
STRUCTURAL_CASES; the full-page golden files are covered by
test_golden_files.py which reads /root/reference/testdata/*.

Empty expected list == Go's ``nil`` (no extraction).
"""

GITHUB_USER_JSON = """{
  "login": "xarantolus",
  "id": 0,
  "node_id": "----",
  "avatar_url": "https://avatars.githubusercontent.com/u/----",
  "gravatar_id": "",
  "url": "https://api.github.com/users/xarantolus",
  "html_url": "https://github.com/xarantolus",
  "followers_url": "https://api.github.com/users/xarantolus/followers",
  "following_url": "https://api.github.com/users/xarantolus/following{/other_user}",
  "gists_url": "https://api.github.com/users/xarantolus/gists{/gist_id}",
  "starred_url": "https://api.github.com/users/xarantolus/starred{/owner}{/repo}",
  "subscriptions_url": "https://api.github.com/users/xarantolus/subscriptions",
  "organizations_url": "https://api.github.com/users/xarantolus/orgs",
  "repos_url": "https://api.github.com/users/xarantolus/repos",
  "events_url": "https://api.github.com/users/xarantolus/events{/privacy}",
  "received_events_url": "https://api.github.com/users/xarantolus/received_events",
  "type": "User",
  "site_admin": false,
  "name": "----",
  "company": null,
  "blog": "----",
  "location": "----",
  "email": "----",
  "hireable": "----",
  "bio": "----",
  "twitter_username": null,
  "public_repos": 17,
  "public_gists": 3,
  "followers": 13,
  "following": 242,
  "created_at": "2017-10-02T18:47:02Z",
  "updated_at": "2021-01-08T20:42:33Z"
}"""

GITHUB_USER_COMPACT = (
    '{"login":"xarantolus","id":0,"node_id":"----",'
    '"avatar_url":"https://avatars.githubusercontent.com/u/----",'
    '"gravatar_id":"","url":"https://api.github.com/users/xarantolus",'
    '"html_url":"https://github.com/xarantolus",'
    '"followers_url":"https://api.github.com/users/xarantolus/followers",'
    '"following_url":"https://api.github.com/users/xarantolus/following{/other_user}",'
    '"gists_url":"https://api.github.com/users/xarantolus/gists{/gist_id}",'
    '"starred_url":"https://api.github.com/users/xarantolus/starred{/owner}{/repo}",'
    '"subscriptions_url":"https://api.github.com/users/xarantolus/subscriptions",'
    '"organizations_url":"https://api.github.com/users/xarantolus/orgs",'
    '"repos_url":"https://api.github.com/users/xarantolus/repos",'
    '"events_url":"https://api.github.com/users/xarantolus/events{/privacy}",'
    '"received_events_url":"https://api.github.com/users/xarantolus/received_events",'
    '"type":"User","site_admin":false,"name":"----","company":null,'
    '"blog":"----","location":"----","email":"----","hireable":"----",'
    '"bio":"----","twitter_username":null,"public_repos":17,'
    '"public_gists":3,"followers":13,"following":242,'
    '"created_at":"2017-10-02T18:47:02Z","updated_at":"2021-01-08T20:42:33Z"}'
)

NEXT_PRIV_ESCAPED = (
    '["<h4 class=\\"popup-title\\">Create new tags</h4>",'
    '"<div class=\\"popup-white\\">",'
    '"<p>Add new tags to the site</p>",'
    '"<div class=\\"actions\\">",'
    '"<span class=\\"rep-number\\">1,424/1,500 Rep.</span>",'
    '"<a href=\\"/help/privileges/create-tags\\" class=\\"s-btn s-btn__primary\\"'
    ' title=\\"Learn more\\">Learn more</a>",'
    '"</div>","</div>"]'
)

NEXT_PRIV_JS = """StackExchange.user.userCardMessages.nextPrivInfo = [
                        '<h4 class="popup-title">Create new tags</h4>',
                        '<div class="popup-white">',
                            '<p>Add new tags to the site</p>',
                            '<div class="actions">',
                                '<span class="rep-number">1,424/1,500 Rep.</span>',
                                '<a href="/help/privileges/create-tags" class="s-btn s-btn__primary" title="Learn more">Learn more</a>',
                            '</div>',
                        '</div>'
                    ].join('');"""

CASES = [
    # reader_test.go:224-241 — NaN family
    ("var x = {n: +NaN}", ['{"n":null}']),
    ("var x = {n: -NaN}", ['{"n":null}']),
    ("var x = {n: NaN}", ['{"n":null}']),
    # :243-246 — fuzz crash regression, unterminated template
    ("[`", []),
    # :247-257 — trailing dots
    ("[1.]", ["[1.0]"]),
    ("{key: 7., arr:[5.0, 5.,]}", ['{"key":7.0,"arr":[5.0,5.0]}']),
    # :259-262
    ("", []),
    # :263-270 — number directly after number
    ("[-30,15 17n]", []),
    ("[0o30 0o0000000004 0o3]", []),
    # :271-276 — backtrack into inner array
    ('{[1.0,3e-3]{""', ["[1.0,3e-3]"]),
    # :277-283 — index-looking arrays are emitted
    ("first[0]", ["[0]"]),
    # :284-289
    ("obj[{i: a}, j]", ['[{"i":"a"},"j"]']),
    # :290-307 — BigInt
    ("{bigint: 50n}", ['{"bigint":50}']),
    ("{bigint: 5030n}", ['{"bigint":5030}']),
    ("{bigint: 505050n}", ['{"bigint":505050}']),
    # :308-314 — hex (negative)
    ("{notbigint: -0x505050}", ['{"notbigint":-5263440}']),
    # :315-332 — sign handling incl. '+'
    ("[-1, 0, 30, +15, 17n]", ["[-1,0,30,15,17]"]),
    ("[-15, -30, -0n, 14, 3]", ["[-15,-30,-0,14,3]"]),
    ("[-0x3, -0o30, 0x0000000000, 0o0000000000, 0x14, 0o3]",
     ["[-3,-24,0,0,20,3]"]),
    # :333-338
    ("{[[undefined, null, ]]}", ["[[null,null]]"]),
    # :339-344
    ("[NaN]", ["[null]"]),
    # :345-356 — binary/octal/hex
    ("[0B101, 0O73, 0x75]", ["[5,59,117]"]),
    ("[0B101, -0O73, 0x75]", ["[5,-59,117]"]),
    # :357-362 — exotic float passthrough, tabs, trailing comma
    ("[\t\t\t5.56789e+0          ,]", ["[5.56789e+0]"]),
    # :398-403
    ("{key: true}", ['{"key":true}']),
    # :404-407 — keyword as key is written bare -> invalid
    ("{true: 30}", []),
    # :408-413 — regex literal
    ("let re = [/ab+c/];", ['["/ab+c/"]']),
    # :414-421 — regex value inside object
    ('{"key": /test/i, useful_data: { "a": "b" }, another_value_we_might_want:"c" }',
     ['{"key":"/test/i","useful_data":{"a":"b"},"another_value_we_might_want":"c"}']),
    # :450-455 — escaped-quote JSON passthrough
    (NEXT_PRIV_ESCAPED, [NEXT_PRIV_ESCAPED]),
    # :456-470 — single-quoted JS version of the same array
    (NEXT_PRIV_JS, [NEXT_PRIV_ESCAPED]),
    # :471-476
    ("[15, 17, -3]", ["[15,17,-3]"]),
    # :477-483 — escaped backtick in template
    ("{ key: ` \\` ` }", ['{"key":" ` "}']),
    # :484-489
    ("[`Template quotes`]", ['["Template quotes"]']),
    # :490-496 — multiline template, newline escaped on output
    ("{ 'key': `this is a\nmultline JavaScript string` }",
     ['{"key":"this is a\\nmultline JavaScript string"}']),
    # :497-502
    ("[`Template quotes inside of template quotes can be escaped using \\``]",
     ['["Template quotes inside of template quotes can be escaped using `"]']),
    # reader.go:421-423 — an EMPTY template (``) trips the "expected
    # string to have at least quotes" guard (len(text) <= 2), so the
    # whole candidate is rejected; a one-char template is the minimum.
    # (Found by grammar fuzzing, round 4.)
    ("x {a: ``} y", []),
    ("x {a: ` `} y", ['{"a":" "}']),
    # :503-508 — literal-looking strings stay strings
    ("{\t\t\ta: 'null',\tb: `true`, c: \"false\"\t\t }",
     ['{"a":"null","b":"true","c":"false"}']),
    # :509-518 — '{' after '{' rejection + resumption
    ('{{ "test": "a" } {}text[] in {}between{}',
     ['{"test":"a"}', "{}", "[]", "{}", "{}"]),
    # :519-528
    ('{{{{{ "test": "a" }} }}}}}}{ {}text[] in {}between{}',
     ['{"test":"a"}', "{}", "[]", "{}", "{}"]),
    # :530-539
    ("{}some {}text[] in {}between{}", ["{}", "{}", "[]", "{}", "{}"]),
    # :540-549
    ("{}{}[]{}{}", ["{}", "{}", "[]", "{}", "{}"]),
    # :550-557
    ('{"a": "b"}', ['{"a":"b"}']),
    ("[1, 3, 55]", ["[1,3,55]"]),
    ("[1, 3, 55, ]", ["[1,3,55]"]),
    # :564-572
    ('{\n\t\t\t"a": "b",\n\t\t\t"c": "trailing comma",\n    \t\t}',
     ['{"a":"b","c":"trailing comma"}']),
    # :573-608 — strict-JSON passthrough (GitHub user payload)
    (GITHUB_USER_JSON, [GITHUB_USER_COMPACT]),
    # :610-617 — no top-level scalars/strings
    ("askdflaksmvalsd", []),
    ('"json encoded text\\nNew line"', []),
    # :618-634 — mean strings
    ('{\n\t\t\t\t"test": "this is a very }{} mean string"\n\t\t\t}',
     ['{"test":"this is a very }{} mean string"}']),
    ('{\n\t\t\t\t"test": "this is another very ][] mean string"\n\t\t\t}',
     ['{"test":"this is another very ][] mean string"}']),
    # :645-652
    ("<script>\n    loadScript('/static/js/sidenav.js', "
     "{type: 'module', async: true, defer: true})\n  </script>",
     ['{"type":"module","async":true,"defer":true}']),
    # :653-658
    ("{'test': \"Test\"}", ['{"test":"Test"}']),
    # :659-668
    ('{\n\t\t\t"a": null,\n\t\t\t"b": true,\n\t\t\t"c": false\n\t\t }',
     ['{"a":null,"b":true,"c":false}']),
    # :669-674
    ("[\"one\", 'two', \"three\", ]", ['["one","two","three"]']),
    # :675-692 — comments + mixed quoting
    ("""{
\t// Keys without quotes are valid in JavaScript, but not in JSON
\tkey: "value",
\tnum: 295.2,

\t// Comments are removed while processing

\t// Mixing normal and quotes keys is possible
\t"obj": {
\t\t"quoted": 325,
\t\tunquoted: 'test', // This trailing comma will be removed
\t}
}""",
     ['{"key":"value","num":295.2,"obj":{"quoted":325,"unquoted":"test"}}']),
    # :693-698 — '&' NOT escaped on the single-quote path
    ("<script>var arr = [\"one\", 'two &amp; three', \"four\", ];</script>",
     ['["one","two &amp; three","four"]']),
    # :699-706 — JS expressions are not data
    ('{"num": 3+3 }', []),
    ("{expr: null || \"fallback string\" }", []),
    # :707-718 — nesting torture
    ("{" * 250 + "}" * 100, ["{}"]),
    ("[" * 100 + "]", ["[]"]),
    # :719-722 — unterminated string swallows everything
    ('["' + "long string " * 100 + "]", []),
    # :723-728
    ('{"test": 0x3}', ['{"test":3}']),
    # -- string escape-sequence pins (r6 fuzz family probes; the quote
    # rewrite is reader.go:255-263, pass-through reader.go:404-409) --
    # \' is rewritten ONLY inside single-quoted strings; inside a
    # double-quoted string it passes through verbatim and json.Valid
    # rejects the buffer (a JS-legal page the extractor drops):
    ("{k: 'a\\'b'}", ['{"k":"a\'b"}']),
    ('{k: "a\\\'b"}', []),
    # JS-only escapes pass through and invalidate: hex, legacy octal,
    # ES6 code point, line continuation
    ("{k: '\\x41'}", []),
    ("{k: '\\101'}", []),
    ("{k: '\\u{41}'}", []),
    ("{k: 'a\\\nb'}", []),
    # \uXXXX is shared JSON/JS syntax — survives both quote styles
    ("{k: '\\u0041'}", ['{"k":"\\u0041"}']),
    # -- object-key dispatch pins (r6 fuzz family probes): keys run
    # the same ident mapping as values (reader.go:318-338 is
    # position-independent), so a keyword KEY becomes a non-string
    # JSON token and the object is dropped; sign truncation applies
    # there too --
    ("{true: 1}", []),
    ("{undefined: 1}", []),
    ("{-true: 1}", []),
    ("{a: 1, NaN: 2}", []),
    # the single-pass rewrite consumes the backslash of \\ as a plain
    # byte, so '\\' + quote ends as \,",… -> invalid, object dropped
    ("{k: 'a\\\\'b'}", []),
]

# Structural equivalents of the two giant StackOverflow <script> cases
# (reader_test.go:363-397 and :422-449): same constructs, shorter arrays.
_GRAPH = "[21455,21455,21490,21500,21590,21610,21640,21665,21680,21690]"
_SO_PAGE = """<script>
        StackExchange.ready(function () {

            $('.js-select-tag-badge').click(function (e) {
                StackExchange.user.nextBadgePopup.load($(this), 101010, /*isTagBadge*/true);
                e.preventDefault();
            });


                    var graphData = %s;
                    StackExchange.user.renderMiniGraph(graphData);


                    StackExchange.user.userCardMessages.nextTagBadgeInfo = [
                        '<h4 class="popup-title">Bronze dictionary tag badge</h4>',
                        '<div class="popup-white">',
                            '<p>Earn at least 100 total score for at least 20 non-community wiki answers in the dictionary tag</p>',
                        '</div>'
                    ].join('');
                        });
    </script>""" % _GRAPH

_SO_BADGE_EXPECT = (
    '["<h4 class=\\"popup-title\\">Bronze dictionary tag badge</h4>",'
    '"<div class=\\"popup-white\\">",'
    '"<p>Earn at least 100 total score for at least 20 non-community wiki'
    ' answers in the dictionary tag</p>","</div>"]'
)

STRUCTURAL_CASES = [
    (_SO_PAGE, [_GRAPH, _SO_BADGE_EXPECT]),
    # :390-397 — array embedded right inside an un-JSON-able object
    ("{}[]{ %s}" % _GRAPH, ["{}", "[]", _GRAPH]),
    # regex readInputBytes undercount: upstream counts only the '/' Div
    # token for a regex literal (reader.go:307-311 vs 339-355), so after a
    # successful emit the scan resumes len(regex)-1 bytes early and
    # re-extracts any bracket value in the tail of the object just emitted.
    ("{a: /xxxxxx/, z:[1]}", ['{"a":"/xxxxxx/","z":[1]}', "[1]"]),
    # Go json.Marshal HTML escaping through the template path (C5,
    # reader.go:428): the upstream fixtures never push <, &, > or
    # U+2028/U+2029 through a Marshal call — these pin the escaped
    # BYTES the Go stdlib documents (< > &    ,
    # SURVEY §4.3.1). (Unquoted keys can't carry these — they must lex
    # as identifiers — so the template and regex literals are the only
    # Marshal paths reachable with HTML-escapable payloads.)
    ("[`a<b&c>d`]", ['["a\\u003cb\\u0026c\\u003ed"]']),
    ("{ t: `u<& v ` }", ['{"t":"u\\u003c\\u0026\\u2028v\\u2029"}']),
    # ... and through the regex-literal path (C6, reader.go:350):
    ("[/a<b&c>d/]", ['["/a\\u003cb\\u0026c\\u003ed/"]']),
    ('{"k": /x<&y/gi }', ['{"k":"/x\\u003c\\u0026y/gi"}']),
    # U+2028 IS a LineTerminator in ECMAScript (RegularExpressionChar
    # excludes it) — a regex literal containing it never terminates, so
    # the object is rejected, not escaped:
    ("{ re: /x<& /g }", []),
]

# transformNumber unit cases (reader_test.go:936-1008). Each is also run
# with '-' and '+' prefixes by the test, like upstream.
TRANSFORM_NUMBER_CASES = [
    ("100", "100"),
    ("1_00", "100"),
    ("0x0000000000000000000045", "69"),
    ("0" * 100, "0"),
    ("11823701928340192387409128357019283740912837409128374901263478912634978127356981273489127346",
     "11823701928340192387409128357019283740912837409128374901263478912634978127356981273489127346"),
    ("0x30", "48"),
    ("18446744073709551615", "18446744073709551615"),
    ("0B101", "5"),
    ("0b" + bin((1 << 64) - 1)[2:], "18446744073709551615"),
    ("5.56789e+0", "5.56789e+0"),
    ("0x" + hex((1 << 64) - 1)[2:], "18446744073709551615"),
    ("0o" + oct((1 << 64) - 1)[2:], "18446744073709551615"),
    ("6.667e-11", "6.667e-11"),
    ("17.5", "17.5"),
    ("1.", "1.0"),
    ("1725.", "1725.0"),
]
