"""The shipped frontend EXECUTES in CI: app.js + tex.js driven end-to-end.

Closes VERDICT r2 item 7's execution gap the strongest way available in
an environment with no JS engine: tools/jsrt (a first-party interpreter
for the frontend's ES2020 subset) runs the actual static files against
a live DOM built from the shipped index.html, with fetch/SSE/timers/
localStorage stubs. Every flow here exercises real render paths, real
dialog flows, and the real SSE reader parse loop.

Reference behaviors covered: conversation CRUD + rename/delete dialogs
(reference core.js Shoelace dialogs), SSE streaming with thinking blocks
and incremental markdown (reference app.js:547-875), [source n]
citation pills, stop/abort, refresh polling, theme cycling, params
popover, upload, edit-resubmit (reference main.js/api.py seams).
"""

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from jsrt.dom import Browser, FakeResponse  # noqa: E402

STATIC = Path(__file__).resolve().parent.parent / \
    "outline_rag_tpu" / "serve" / "static"

CONV_ID = "11111111-2222-3333-4444-555555555555"


class Routes:
    """Canned API surface mirroring serve/app.py's route contracts."""

    def __init__(self):
        self.requests = []  # (method, url, opts)
        self.me = {
            "user": {"name": "Testa", "email": "t@example.com"},
            "models": [
                {"id": "anthropic/claude-3", "label": "Claude 3"},
                {"id": "openai/gpt-4", "label": "GPT-4"},
            ],
        }
        self.conversations = [{"id": CONV_ID, "title": "Old chat"}]
        self.messages = {"messages": []}
        self.ask_response = None  # FakeResponse.stream() if streaming
        self.refresh_states = []  # popped per /refresh/status poll
        self.unauthorized = False

    def __call__(self, url, opts):
        method = (opts.get("method") or "GET").upper()
        self.requests.append((method, url, opts))
        if self.unauthorized:
            return FakeResponse.json_reply({}, status=401)
        if url.endswith("/me"):
            return FakeResponse.json_reply(self.me)
        if url.endswith("/conversations") and method == "POST":
            body = json.loads(opts.get("body") or "{}")
            conv = {"id": CONV_ID, "title": body.get("title", "")}
            self.conversations.insert(0, conv)
            return FakeResponse.json_reply(conv)
        if url.endswith("/conversations"):
            return FakeResponse.json_reply(
                {"conversations": self.conversations})
        if url.endswith("/messages"):
            return FakeResponse.json_reply(self.messages)
        if url.endswith("/ask"):
            return self.ask_response or FakeResponse.stream()
        if url.endswith("/update/all"):
            return FakeResponse.json_reply({"status": "started"})
        if url.endswith("/refresh/status"):
            state = self.refresh_states.pop(0) if self.refresh_states \
                else {"state": "idle"}
            return FakeResponse.json_reply(state)
        if url.endswith("/upload"):
            return FakeResponse.json_reply({"ok": True})
        if method in ("PUT", "DELETE"):  # conversation mutations
            return FakeResponse.json_reply({"ok": True})
        raise AssertionError(f"unrouted fetch: {method} {url}")

    def calls(self, suffix, method=None):
        return [
            (m, u, o) for (m, u, o) in self.requests
            if u.endswith(suffix) and (method is None or m == method)
        ]


@pytest.fixture()
def routes():
    return Routes()


@pytest.fixture()
def browser(routes):
    b = Browser(html_path=str(STATIC / "index.html"),
                static_dir=str(STATIC))
    b.on_fetch = routes
    b.boot()
    return b


def sse(**delta):
    payload = {"choices": [{"delta": delta}], "model": "anthropic/claude-3"}
    return "data: " + json.dumps(payload) + "\n\n"


# ---------------------------------------------------------------------------
# boot


def test_boot_renders_greeting_models_and_conversations(browser, routes):
    assert browser.text(".greet-title") == "Hello, Testa!"
    opts = browser.q("#model-picker").query_all("option")
    assert [o.text() for o in opts] == ["Claude 3", "GPT-4"]
    assert "Old chat" in browser.text("#conv-list")
    # generated monogram avatar for the picker's current model
    icon = browser.q("#model-icon").inner_html()
    assert "<svg" in icon and ">A</text>" in icon  # 'anthropic' monogram


def test_boot_applies_persisted_theme(routes):
    b = Browser(html_path=str(STATIC / "index.html"),
                static_dir=str(STATIC))
    b.local_storage["theme"] = "light"
    b.on_fetch = routes
    b.boot()
    assert b.q("html").attrs.get("data-theme") == "light"


def test_unauthorized_me_redirects_to_login(routes):
    routes.unauthorized = True
    b = Browser(html_path=str(STATIC / "index.html"),
                static_dir=str(STATIC))
    b.on_fetch = routes
    b.boot()
    assert ("href", "/chat/login") in b.navigations


def test_theme_cycles_dark_light_system(browser):
    assert browser.q("html").attrs.get("data-theme") == "dark"
    browser.click("#theme-toggle")
    assert browser.q("html").attrs.get("data-theme") == "light"
    assert browser.local_storage["theme"] == "light"
    browser.click("#theme-toggle")  # -> system (media says light)
    assert browser.local_storage["theme"] == "system"
    assert browser.q("html").attrs.get("data-theme") == "light"
    # system choice follows prefers-color-scheme changes live
    browser.fire_media_change(dark=True)
    assert browser.q("html").attrs.get("data-theme") == "dark"
    browser.click("#theme-toggle")  # cycles back to dark
    assert browser.local_storage["theme"] == "dark"


def test_avatar_and_account_menu(browser):
    """Avatar circle carries the user's initial; its dropdown has the
    identity block, a theme radio group, and sign-out (reference
    topbar.css .avatar/.menu)."""
    av = browser.q("#avatar")
    assert av.text() == "T"  # Testa
    assert av.props.get("title") == "Testa"
    menu = browser.q("#account-menu")
    assert "visible" not in menu.classes()
    browser.click("#avatar")
    assert "visible" in menu.classes()
    assert "Testa" in menu.text() and "t@example.com" in menu.text()
    out = menu.query_all("a")[-1]
    assert out.attrs.get("href") == "/chat/logout"
    # the persisted choice is marked active
    radios = menu.query_all(".menu-radio")
    assert [r.text() for r in radios] == ["Dark", "Light", "System"]
    assert "active" in radios[0].classes()  # default dark
    # picking a radio applies the theme, re-marks, keeps the menu open
    browser.dispatch(radios[1], "click")
    assert browser.q("html").attrs.get("data-theme") == "light"
    assert browser.local_storage["theme"] == "light"
    assert "active" in radios[1].classes()
    assert "active" not in radios[0].classes()
    assert "visible" in menu.classes()
    # clicking anywhere outside closes the dropdown
    browser.click("#messages")
    assert "visible" not in menu.classes()
    # the topbar cycle button keeps the radios in sync
    browser.click("#theme-toggle")  # light -> system
    assert "active" in browser.q("#account-menu").query_all(".menu-radio")[2].classes()


def test_popovers_are_mutually_exclusive_and_escape_closes(browser):
    """One popover manager: params sheet, account menu, and conv menus
    can never stack; Escape closes whatever is open."""
    browser.click("#params-toggle")
    assert "open" in browser.q("#params-pop").classes()
    browser.click("#avatar")  # opening the account menu closes params
    assert "open" not in browser.q("#params-pop").classes()
    assert "sheet-open" not in browser.q("body").classes()
    assert "visible" in browser.q("#account-menu").classes()
    browser.click("#params-toggle")  # and vice versa
    assert "visible" not in browser.q("#account-menu").classes()
    assert "open" in browser.q("#params-pop").classes()
    browser.dispatch(browser.q("body"), "keydown", {"key": "Escape"})
    assert "open" not in browser.q("#params-pop").classes()
    assert "sheet-open" not in browser.q("body").classes()


def test_sidebar_veil_opens_and_closes(browser):
    """Hamburger opens the drawer + veil; tapping the veil closes both
    (reference sidebar.css .sidebar-veil)."""
    assert "open" not in browser.q("#sidebar").classes()
    browser.click("#menu-toggle")
    assert "open" in browser.q("#sidebar").classes()
    assert "side-open" in browser.q("body").classes()
    browser.click("#side-veil")
    assert "open" not in browser.q("#sidebar").classes()
    assert "side-open" not in browser.q("body").classes()


def test_conv_menu_closes_on_outside_click_and_is_exclusive(browser, routes):
    routes.conversations.append({"id": CONV_ID.replace("1", "9"),
                                 "title": "Second chat"})
    browser.click("#new-conv")  # re-render the list with two rows
    lis = browser.q("#conv-list").query_all("li")
    assert len(lis) == 2
    browser.dispatch(lis[0].query("button.conv-menu"), "click")
    assert "visible" in lis[0].query(".conv-menu-pop").classes()
    # opening the second closes the first (one popover at a time)
    browser.dispatch(lis[1].query("button.conv-menu"), "click")
    assert "visible" not in lis[0].query(".conv-menu-pop").classes()
    assert "visible" in lis[1].query(".conv-menu-pop").classes()
    # outside click closes everything
    browser.click("#messages")
    assert "visible" not in lis[1].query(".conv-menu-pop").classes()


# ---------------------------------------------------------------------------
# conversations


def test_select_conversation_loads_messages_and_pushes_history(
        browser, routes):
    routes.messages = {"messages": [
        {"id": 1, "role": "user", "content": "hi"},
        {"id": 2, "role": "assistant", "content": "hello **there**"},
    ]}
    browser.click("#conv-list li span")
    assert ("pushState", f"/chat/{CONV_ID}") in browser.navigations
    assert browser.text("#conv-title") == "Old chat"
    bubble = browser.q("#messages .msg.assistant .bubble")
    assert "<strong>there</strong>" in bubble.inner_html()
    # the user message got an edit button, the assistant a copy button
    assert browser.maybe("#messages .msg.user button.edit") is not None
    assert browser.maybe("#messages .msg.assistant button.copy") is not None


def open_conv_menu(browser):
    """Open the per-conversation '⋯' actions popover; returns its
    [Rename, Delete] items (reference sidebar conv-menu behavior)."""
    browser.click("#conv-list li button.conv-menu")
    pop = browser.q("#conv-list li .conv-menu-pop")
    assert "visible" in pop.classes()
    # real <button>s: keyboard users can Tab + Enter the actions
    items = pop.query_all("button")
    assert [i.text() for i in items] == ["Rename", "Delete"]
    return items


def test_rename_dialog_flow(browser, routes):
    browser.q("#conv-list li")  # exists
    items = open_conv_menu(browser)
    browser.dispatch(items[0], "click")
    # choosing an action closes the popover before the dialog opens
    assert "visible" not in browser.q("#conv-list li .conv-menu-pop").classes()
    modal = browser.q(".modal-overlay .modal")
    assert "Rename conversation" in modal.text()
    field = browser.q(".modal-overlay .modal-input")
    assert field.props.get("value") == "Old chat"  # prefilled
    field.props["value"] = "New title"
    # primary button confirms
    browser.click(".modal-overlay .modal-btn.primary")
    puts = routes.calls(f"/conversations/{CONV_ID}", "PUT")
    assert len(puts) == 1
    assert json.loads(puts[0][2]["body"]) == {"title": "New title"}
    assert browser.maybe(".modal-overlay") is None  # closed
    assert "renamed" in browser.text("#toasts")


def test_delete_dialog_cancel_then_confirm(browser, routes):
    items = open_conv_menu(browser)
    delete_item = items[1]
    assert "danger" in delete_item.classes()  # destructive styling in menu
    browser.dispatch(delete_item, "click")
    assert browser.maybe(".modal-overlay") is not None
    browser.click(".modal-overlay .modal-btn")  # Cancel (non-primary)
    assert routes.calls(f"/conversations/{CONV_ID}", "DELETE") == []
    assert browser.maybe(".modal-overlay") is None
    items = open_conv_menu(browser)
    browser.dispatch(items[1], "click")
    ok = browser.q(".modal-overlay .modal-btn.primary")
    assert "danger" in ok.classes()  # destructive styling
    browser.dispatch(ok, "click")
    assert len(routes.calls(f"/conversations/{CONV_ID}", "DELETE")) == 1


def test_dialog_escape_key_cancels(browser, routes):
    items = open_conv_menu(browser)
    browser.dispatch(items[1], "click")
    assert browser.maybe(".modal-overlay") is not None
    browser.dispatch(browser.q("body"), "keydown", {"key": "Escape"})
    assert browser.maybe(".modal-overlay") is None
    assert routes.calls(f"/conversations/{CONV_ID}", "DELETE") == []


def test_new_conversation_button_shows_greeting(browser):
    browser.click("#new-conv")
    assert browser.maybe("#messages .greeting") is not None
    assert browser.text("#conv-title") == "New conversation"
    assert ("pushState", "/chat/") in browser.navigations


# ---------------------------------------------------------------------------
# ask / SSE streaming


def ask(browser, routes, question="what is E?"):
    stream = FakeResponse.stream()
    routes.ask_response = stream
    browser.type_text("#input", question)
    browser.press("#input", "Enter")
    return stream


def test_ask_streams_thinking_then_content(browser, routes):
    stream = ask(browser, routes)
    # a conversation was auto-created with the question as title
    posts = routes.calls("/conversations", "POST")
    assert len(posts) == 1
    assert json.loads(posts[0][2]["body"])["title"] == "what is E?"
    # streaming state: stop visible, send hidden
    assert browser.q("#send").props.get("hidden") is True
    assert browser.q("#stop").props.get("hidden") is False

    stream.push(sse(thinking="let me think"))
    think = browser.q("#messages .msg.assistant details.thinking")
    assert think.props.get("open") is True  # open while thinking
    assert "let me think" in think.text()
    # thinking chunks render as fade-in spans (streaming effect)
    assert 'class="fade-chunk"' in think.serialize()

    stream.push(sse(content="The formula is $E = mc^2$ "))
    stream.push(sse(content="from **relativity**.\n\n- item one\n"))
    assert browser.q(
        "#messages .msg.assistant details.thinking"
    ).props.get("open") is False  # folds when the answer starts
    bubble = browser.q("#messages .msg.assistant .bubble")
    html = bubble.serialize()
    assert "<strong>relativity</strong>" in html
    assert 'class="tex' in html or 'class="math' in html  # typeset math
    assert "<li>item one</li>" in html

    # persisted reload after [DONE]
    routes.messages = {"messages": [
        {"id": 1, "role": "user", "content": "what is E?"},
        {"id": 2, "role": "assistant", "content":
            "answer [source 1]\n[SourcesMap]: " + json.dumps(
                {"1": {"url": "https://w/d1", "title": "Doc"}})},
    ]}
    stream.push("data: [DONE]\n\n")
    stream.finish()
    post = browser.q("#messages .msg.assistant .bubble").serialize()
    assert '<a class="citation" href="https://w/d1"' in post
    assert browser.q("#send").props.get("hidden") is False
    assert browser.q("#stop").props.get("hidden") is True


def test_loose_citation_forms_linkify(browser, routes):
    """Reference-parity tolerant citation matching (looseCitationRegex,
    reference app/static/js/app.js:55): bracket families, 来源/参考/
    Source labels, bare and multi numbers all linkify; unmapped numbers
    and tokens inside code stay verbatim (VERDICT r3 item 7)."""
    srcs = {str(n): {"url": f"https://w/d{n}", "title": f"Doc {n}"}
            for n in (1, 2, 3, 4)}
    content = (
        "a [来源 1] b 【参考 2】 c (Source 3) d [4] e [source 9] "
        "f [来源 1, 2]\n\n"
        "```\ncode [source 1] stays\n```\n\n"
        "inline `see [2]` too"
    )
    routes.messages = {"messages": [
        {"id": 1, "role": "user", "content": "q"},
        {"id": 2, "role": "assistant",
         "content": content + "\n[SourcesMap]: " + json.dumps(srcs)},
    ]}
    browser.click("#conv-list li span")
    html = browser.q("#messages .msg.assistant .bubble").serialize()
    for n in (1, 2, 3, 4):
        assert f'href="https://w/d{n}"' in html, (n, html)
    # one anchor per number in the multi-number token -> d1 twice, d2 twice
    assert html.count('href="https://w/d1"') == 2
    assert html.count('href="https://w/d2"') == 2
    assert "[source 9]" in html  # unmapped number stays verbatim
    # exactly the 6 mapped tokens outside code linkified: nothing
    # inside the fence or the inline code grew an anchor
    assert html.count('class="citation"') == 6
    assert "] stays" in html and "citation" not in html.split("<pre")[1].split("</pre>")[0]


def test_avatar_uses_oidc_picture(browser, routes):
    """The identity provider's `picture` claim renders as the account
    avatar image; without it (or with an unsafe scheme) the initial
    monogram stays (reference avatar_url, app/static/js/app.js:108)."""
    # default fixture has no picture -> monogram from name "Testa"
    assert browser.q("#avatar").text().strip() == "T"
    assert browser.maybe("#avatar img.avatar-img") is None

    def boot_with(picture):
        r = Routes()
        r.me["user"]["picture"] = picture
        b = Browser(html_path=str(STATIC / "index.html"),
                    static_dir=str(STATIC))
        b.on_fetch = r
        b.boot()
        return b

    b2 = boot_with("https://idp/avatar.png")
    img = b2.maybe("#avatar img.avatar-img")
    assert img is not None and img.attrs.get("src") == "https://idp/avatar.png"
    # unsafe scheme is neutralized by safeHref -> monogram fallback
    b3 = boot_with("javascript:alert(1)")
    assert b3.maybe("#avatar img.avatar-img") is None
    assert b3.q("#avatar").text().strip() == "T"


def test_incremental_render_does_not_split_code_fences(browser, routes):
    stream = ask(browser, routes)
    # a fence containing a blank line arrives across two frames: the
    # stable cut must NOT advance into the open fence
    stream.push(sse(content="intro\n\n```py\na = 1\n\n"))
    stream.push(sse(content="b = 2\n```\n\nafter\n"))
    html = browser.q("#messages .msg.assistant .bubble").serialize()
    assert html.count("<pre>") == 1  # one block, not split
    assert "a = " in html and "b = " in html  # both lines in that block
    stream.finish()


def test_stop_button_aborts_without_error_bubble(browser, routes):
    stream = ask(browser, routes)
    stream.push(sse(content="partial"))
    browser.click("#stop")  # AbortController.abort()
    assert "connection lost" not in browser.q("#messages").serialize()
    assert browser.q("#send").props.get("hidden") is False  # cleaned up


def test_connection_loss_shows_error(browser, routes):
    stream = ask(browser, routes)
    stream.push(sse(content="partial"))
    stream.fail("NetworkError")
    assert "connection lost" in browser.q("#messages").serialize()
    assert browser.q("#send").props.get("hidden") is False


def test_shift_enter_does_not_send(browser, routes):
    browser.type_text("#input", "multiline draft")
    browser.press("#input", "Enter", shiftKey=True)
    assert routes.calls("/ask") == []


def test_greeting_chip_sends_suggestion(browser, routes):
    routes.ask_response = FakeResponse.stream()
    browser.click("#messages .greeting .chip")
    asks = routes.calls("/ask")
    assert len(asks) == 1
    q = json.loads(asks[0][2]["body"])["question"]
    assert q == "Summarize the getting-started guide"
    routes.ask_response.finish()


def test_edit_resubmit_sends_edit_message_id(browser, routes):
    routes.messages = {"messages": [
        {"id": 7, "role": "user", "content": "original question"},
        {"id": 8, "role": "assistant", "content": "answer"},
    ]}
    browser.click("#conv-list li span")
    browser.click("#messages .msg.user button.edit")
    assert browser.q("#input").props.get("value") == "original question"
    browser.q("#input").props["value"] = "edited question"
    routes.ask_response = FakeResponse.stream()
    browser.press("#input", "Enter")
    body = json.loads(routes.calls("/ask")[0][2]["body"])
    assert body["edit_message_id"] == 7
    assert body["question"] == "edited question"
    routes.ask_response.finish()


def test_ask_sends_model_and_sampling_params(browser, routes):
    browser.click("#params-toggle")
    browser.q("#temp-slider").props["value"] = "0.3"
    browser.dispatch(browser.q("#temp-slider"), "input")
    stream = ask(browser, routes)
    body = json.loads(routes.calls("/ask")[0][2]["body"])
    assert body["model"] == "anthropic/claude-3"
    assert body["temperature"] == 0.3
    stream.finish()


def test_model_badge_updates_from_stream(browser, routes):
    stream = ask(browser, routes)
    stream.push(sse(content="hi"))
    avatar = browser.q("#messages .msg.assistant .avatar")
    assert avatar.attrs.get("data-model") == "anthropic/claude-3"
    assert avatar.props.get("title") == "anthropic/claude-3"
    stream.finish()


# ---------------------------------------------------------------------------
# XSS safety — executed, not just string-contracted


def test_user_and_assistant_content_stays_escaped(browser, routes):
    routes.messages = {"messages": [
        {"id": 1, "role": "user",
         "content": "<script>alert(1)</script>"},
        {"id": 2, "role": "assistant",
         "content": "evil <img src=x onerror=alert(2)> "
                    "[link](javascript:alert(3))"},
    ]}
    browser.click("#conv-list li span")
    html = browser.q("#messages").serialize()
    assert "<script>alert(1)</script>" not in html
    assert "&lt;script&gt;" in html
    assert "<img src=x" not in html
    assert 'href="#"' in html  # javascript: URL neutralized


# ---------------------------------------------------------------------------
# refresh polling / upload / popover


def test_refresh_polls_status_until_done(browser, routes):
    routes.refresh_states = [
        {"state": "running", "progress": 0.5, "success": 3, "skipped": 1},
        {"state": "done", "success": 7, "skipped": 2},
        {"state": "idle"},
    ]
    browser.click("#refresh-kb")
    assert len(routes.calls("/update/all", "POST")) == 1
    browser.advance(3000)
    assert "50%" in browser.text("#refresh-status")
    browser.advance(3000)
    assert "7 indexed" in browser.text("#refresh-status")
    # interval cleared: no further /refresh/status polls
    polls = len(routes.calls("/refresh/status"))
    browser.advance(9000)
    assert len(routes.calls("/refresh/status")) == polls


def test_upload_posts_formdata_and_resets_input(browser, routes):
    from jsrt.interp import JSArray, JSObject
    fi = browser.q("#file-input")
    fi.props["files"] = JSArray([JSObject({"name": "notes.txt"})])
    browser.dispatch(fi, "change")
    uploads = routes.calls("/upload", "POST")
    assert len(uploads) == 1
    entries = uploads[0][2]["body"]
    assert entries[0][0] == "file"
    assert "Uploaded notes.txt" in browser.text("#toasts")
    assert fi.props.get("value") == ""


def test_params_popover_toggles_and_closes_on_outside_click(browser):
    browser.click("#params-toggle")
    assert "open" in browser.q("#params-pop").classes()
    assert "sheet-open" in browser.q("body").classes()  # mobile sheet
    browser.dispatch(browser.q("#messages"), "click")  # outside
    assert "open" not in browser.q("#params-pop").classes()
    assert "sheet-open" not in browser.q("body").classes()


def test_popstate_navigates_back_to_greeting(browser, routes):
    routes.messages = {"messages": [
        {"id": 1, "role": "user", "content": "hi"},
        {"id": 2, "role": "assistant", "content": "yo"},
    ]}
    browser.click("#conv-list li span")
    assert browser.maybe("#messages .greeting") is None
    browser.pathname = "/chat/"
    browser.fire_window("popstate")
    assert browser.maybe("#messages .greeting") is not None
    assert browser.text("#conv-title") == "New conversation"


def test_deep_link_boot_selects_conversation(routes):
    routes.messages = {"messages": [
        {"id": 1, "role": "user", "content": "deep"},
        {"id": 2, "role": "assistant", "content": "linked"},
    ]}
    b = Browser(html_path=str(STATIC / "index.html"),
                static_dir=str(STATIC), pathname=f"/chat/{CONV_ID}")
    b.on_fetch = routes
    b.boot()
    assert "linked" in b.q("#messages").text()
    # no extra pushState for the initial deep link (push: false)
    assert ("pushState", f"/chat/{CONV_ID}") not in b.navigations


def test_message_meta_line_renders_model_and_time(browser, routes):
    """Persisted assistant messages show the msg-meta line (model
    display name + local time) under the bubble; user messages don't."""
    routes.messages = {"messages": [
        {"id": 1, "role": "user", "content": "q",
         "model": None, "created_at": "2026-08-17 10:30:00"},
        {"id": 2, "role": "assistant", "content": "a",
         "model": "openai/gpt-4", "created_at": "2026-08-17 10:30:05"},
        {"id": 3, "role": "assistant", "content": "b",
         "model": "gone/model", "created_at": "2026-08-17 10:31:00"},
    ]}
    browser.click("#conv-list li span")
    metas = browser.q("#messages").query_all(".msg-meta")
    assert len(metas) == 2
    # catalog display label resolves (the /me payload field is `label`)
    assert "GPT-4" in metas[0].text() and "Aug 17" in metas[0].text()
    # a model no longer in the catalog falls back to its raw id
    assert "gone/model" in metas[1].text()
    assert browser.maybe("#messages .msg.user .msg-meta") is None


def test_edit_state_shows_cancel_and_escape_backs_out(browser, routes):
    routes.messages = {"messages": [
        {"id": 7, "role": "user", "content": "original question"},
        {"id": 8, "role": "assistant", "content": "answer"},
    ]}
    browser.click("#conv-list li span")
    browser.click("#messages .msg.user button.edit")
    composer = browser.q("#composer")
    assert "editing" in (composer.attrs.get("class") or "")
    assert browser.q("#cancel-edit").props.get("hidden") is not True
    # Esc backs out: editId cleared, input emptied, pill hidden
    browser.press("#input", "Escape")
    assert "editing" not in (composer.attrs.get("class") or "")
    assert browser.q("#cancel-edit").props.get("hidden") is True
    assert not browser.q("#input").props.get("value")
    # a subsequent plain send must NOT carry edit_message_id
    browser.q("#input").props["value"] = "fresh question"
    routes.ask_response = FakeResponse.stream()
    browser.press("#input", "Enter")
    body = json.loads(routes.calls("/ask")[0][2]["body"])
    assert "edit_message_id" not in body or body["edit_message_id"] is None
    routes.ask_response.finish()


def test_idless_message_edit_prefills_without_edit_state(browser, routes):
    """A user message without an id (e.g. live-appended before
    persistence) prefills the composer from its edit button but must NOT
    enter the editing state (nothing to edit-resubmit server-side); Esc
    outside the editing state is a no-op that leaves typed text alone."""
    routes.messages = {"messages": [
        {"id": None, "role": "user", "content": "draft question"},
    ]}
    browser.click("#conv-list li span")
    browser.click("#messages .msg.user button.edit")
    assert browser.q("#input").props.get("value") == "draft question"
    assert "editing" not in (browser.q("#composer").attrs.get("class") or "")
    # pill never shown: hidden untouched (None = HTML attr) or re-hidden
    assert browser.q("#cancel-edit").props.get("hidden") is not False
    browser.press("#input", "Escape")  # no-op: prefill survives
    assert browser.q("#input").props.get("value") == "draft question"


def test_streaming_respects_reader_scroll_position(browser, routes):
    """Autoscroll only while pinned to the bottom: a reader who scrolled
    up to re-read must not be yanked down by each SSE frame."""
    stream = ask(browser, routes, "long answer please")
    box = browser.q("#messages")
    # give the stub layout: viewport 200 tall, content 1000, reader at top
    box.props["clientHeight"] = 200.0
    box.props["scrollHeight"] = 1000.0
    box.props["scrollTop"] = 0.0
    stream.push('data: {"choices":[{"delta":{"content":"more text"}}]}\n\n')
    assert box.props["scrollTop"] == 0.0  # not yanked
    # reader returns to the bottom: frames follow again
    box.props["scrollTop"] = 790.0  # 1000 - 200 - 10 < 48 slack
    stream.push('data: {"choices":[{"delta":{"content":" and more"}}]}\n\n')
    assert box.props["scrollTop"] == 1000.0
    stream.finish()


def test_citation_urls_are_scheme_checked_and_quote_escaped(browser, routes):
    """Stored XSS guards: a javascript: URL in the SourcesMap must not
    become a live href, and quotes in titles/URLs must not break out of
    their attributes."""
    routes.messages = {"messages": [
        {"id": 1, "role": "user", "content": "q"},
        {"id": 2, "role": "assistant", "content":
            "a [source 1] b [source 2]\n[SourcesMap]: " + json.dumps({
                "1": {"url": "javascript:alert(1)", "title": "evil"},
                "2": {"url": 'https://w/d"onmouseover="alert(2)',
                      "title": 'T" onclick="alert(3)'},
            })},
    ]}
    browser.click("#conv-list li span")
    html = browser.q("#messages .msg.assistant .bubble").serialize()
    assert "javascript:" not in html
    assert 'href="#"' in html  # unsafe scheme neutralized
    # no attribute breakout: every interpolated quote must be &quot; —
    # a RAW quote before the handler text is what browsers error-recover
    # into a live attribute
    assert '"onmouseover' not in html and '" onmouseover' not in html
    assert '"onclick' not in html and '" onclick' not in html
    assert "&quot;" in html  # the quotes survived, escaped


def test_dialog_enter_on_focused_cancel_cancels(browser, routes):
    """Enter with the Cancel button focused must activate Cancel — it
    used to resolve(true) and delete the conversation anyway."""
    items = open_conv_menu(browser)
    browser.dispatch(items[1], "click")
    cancel = browser.q(".modal-overlay .modal-btn")  # first = Cancel
    browser.active_element = cancel
    browser.dispatch(browser.q("body"), "keydown", {"key": "Enter"})
    # dialog closed via Cancel: no DELETE issued, conversation intact
    assert browser.maybe(".modal-overlay") is None
    assert not [r for r in routes.requests if r[0] == "DELETE"]
    assert browser.q("#conv-list li") is not None
