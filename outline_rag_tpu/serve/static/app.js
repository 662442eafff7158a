/* Chat SPA for the TPU-native Outline RAG framework.
 *
 * Covers the user-visible behaviors of the reference frontend
 * (conversation CRUD, SSE streaming with thinking blocks, [SourcesMap]
 * citation linkification, refresh-status polling, edit-and-resubmit) in
 * dependency-free vanilla JS.
 */
"use strict";

const API = "/chat/api";
const $ = (sel) => document.querySelector(sel);

const state = {
  me: null,
  models: [],
  conversations: [],
  current: null,
  streaming: false,
  abort: null,
};

// ---------- tiny helpers ----------

async function api(path, opts = {}) {
  const resp = await fetch(API + path, {
    headers: { "content-type": "application/json" },
    credentials: "same-origin",
    ...opts,
  });
  if (resp.status === 401) {
    window.location.href = "/chat/login";
    throw new Error("unauthorized");
  }
  return resp;
}

function esc(s) {
  return s.replace(/&/g, "&amp;").replace(/</g, "&lt;").replace(/>/g, "&gt;");
}

/* minimal markdown: fenced code blocks, inline code, bold, paragraphs */
function renderMarkdownLite(text) {
  const blocks = text.split(/```/);
  let html = "";
  blocks.forEach((blk, i) => {
    if (i % 2 === 1) {
      html += "<pre><code>" + esc(blk.replace(/^[a-z]*\n/, "")) + "</code></pre>";
    } else {
      const para = esc(blk)
        .replace(/`([^`]+)`/g, "<code>$1</code>")
        .replace(/\*\*([^*]+)\*\*/g, "<strong>$1</strong>")
        .split(/\n{2,}/)
        .map((p) => (p.trim() ? "<p>" + p.replace(/\n/g, "<br/>") + "</p>" : ""))
        .join("");
      html += para;
    }
  });
  return html;
}

/* Extract hidden sources map + thinking block, linkify [source n]. */
function renderAssistant(content) {
  let thinking = null;
  const tOpen = "\n<!--thinking-->\n", tClose = "\n<!--/thinking-->\n";
  if (content.includes(tOpen) && content.includes(tClose)) {
    const pre = content.split(tOpen)[0];
    const rest = content.split(tOpen)[1];
    thinking = rest.split(tClose)[0];
    content = pre + rest.split(tClose).slice(1).join(tClose);
  }
  let sources = null;
  content = content
    .split("\n")
    .filter((line) => {
      if (line.startsWith("[SourcesMap]:")) {
        try { sources = JSON.parse(line.slice(13).trim()); } catch (e) {}
        return false;
      }
      return true;
    })
    .join("\n");
  let html = renderMarkdownLite(content.trim());
  if (sources) {
    html = html.replace(/\[source (\d+)\]/g, (m, n) => {
      const src = sources[n];
      if (!src) return m;
      return `<a class="citation" href="${esc(src.url || "#")}" target="_blank" title="${esc(src.title || "")}">[${n}]</a>`;
    });
  }
  let out = "";
  if (thinking) {
    out += `<details class="thinking"><summary>thinking</summary><div>${renderMarkdownLite(thinking.trim())}</div></details>`;
  }
  return out + html;
}

// ---------- conversations ----------

async function loadMe() {
  const resp = await api("/me");
  const data = await resp.json();
  state.me = data.user;
  state.models = data.models;
  const picker = $("#model-picker");
  picker.innerHTML = "";
  data.models.forEach((m) => {
    const opt = document.createElement("option");
    opt.value = m.id;
    opt.textContent = m.label;
    picker.appendChild(opt);
  });
}

async function loadConversations() {
  const resp = await api("/conversations");
  state.conversations = (await resp.json()).conversations;
  const ul = $("#conv-list");
  ul.innerHTML = "";
  state.conversations.forEach((c) => {
    const li = document.createElement("li");
    li.dataset.id = c.id;
    li.className = c.id === state.current ? "active" : "";
    const title = document.createElement("span");
    title.textContent = c.title || "Untitled";
    title.onclick = () => selectConversation(c.id);
    const ren = document.createElement("button");
    ren.textContent = "✎";
    ren.onclick = async () => {
      const t = prompt("Rename conversation", c.title);
      if (t) { await api(`/conversations/${c.id}`, { method: "PUT", body: JSON.stringify({ title: t }) }); loadConversations(); }
    };
    const del = document.createElement("button");
    del.textContent = "×";
    del.onclick = async () => {
      if (!confirm("Delete conversation?")) return;
      await api(`/conversations/${c.id}`, { method: "DELETE" });
      if (state.current === c.id) { state.current = null; $("#messages").innerHTML = ""; }
      loadConversations();
    };
    li.append(title, ren, del);
    ul.appendChild(li);
  });
}

async function selectConversation(id) {
  state.current = id;
  history.replaceState(null, "", `/chat/${id}`);
  const conv = state.conversations.find((c) => c.id === id);
  $("#conv-title").textContent = conv ? conv.title : "";
  await loadMessages();
  loadConversations();
}

async function loadMessages() {
  if (!state.current) return;
  const resp = await api(`/conversations/${state.current}/messages`);
  const data = await resp.json();
  const box = $("#messages");
  box.innerHTML = "";
  data.messages.forEach((m) => appendMessage(m.role, m.content, m.id));
  box.scrollTop = box.scrollHeight;
}

function appendMessage(role, content, id) {
  const div = document.createElement("div");
  div.className = "msg " + role;
  if (id) div.dataset.id = id;
  if (role === "assistant") {
    div.innerHTML = renderAssistant(content || "");
  } else {
    div.innerHTML = renderMarkdownLite(content || "");
    const edit = document.createElement("button");
    edit.className = "edit";
    edit.textContent = "✎";
    edit.onclick = () => {
      $("#input").value = content;
      $("#input").dataset.editId = id || "";
      $("#input").focus();
    };
    div.appendChild(edit);
  }
  $("#messages").appendChild(div);
  return div;
}

// ---------- ask / SSE ----------

async function sendQuestion() {
  const input = $("#input");
  const question = input.value.trim();
  if (!question || state.streaming) return;
  if (!state.current) {
    const resp = await api("/conversations", {
      method: "POST",
      body: JSON.stringify({ title: question.slice(0, 48) }),
    });
    const conv = await resp.json();
    state.current = conv.id;
    await loadConversations();
  }
  const editId = input.dataset.editId || null;
  input.value = "";
  delete input.dataset.editId;
  if (editId) await loadMessages();
  appendMessage("user", question);

  const assistantDiv = appendMessage("assistant", "");
  assistantDiv.classList.add("streaming");
  state.streaming = true;
  $("#send").hidden = true;
  $("#stop").hidden = false;
  state.abort = new AbortController();

  let content = "", thinking = "";
  try {
    const resp = await fetch(API + "/ask", {
      method: "POST",
      headers: { "content-type": "application/json" },
      credentials: "same-origin",
      signal: state.abort.signal,
      body: JSON.stringify({
        question,
        conversation_id: state.current,
        model: $("#model-picker").value,
        edit_message_id: editId ? parseInt(editId, 10) : undefined,
      }),
    });
    const reader = resp.body.getReader();
    const decoder = new TextDecoder();
    let buf = "";
    for (;;) {
      const { done, value } = await reader.read();
      if (done) break;
      buf += decoder.decode(value, { stream: true });
      const frames = buf.split("\n\n");
      buf = frames.pop();
      for (const frame of frames) {
        const line = frame.split("\n").find((l) => l.startsWith("data:"));
        if (!line) continue;
        const payload = line.slice(5).trim();
        if (payload === "[DONE]") continue;
        let obj;
        try { obj = JSON.parse(payload); } catch (e) { continue; }
        const delta = obj.choices?.[0]?.delta || {};
        if (delta.thinking) thinking += delta.thinking;
        if (delta.content) content += delta.content;
        const full = (thinking ? "\n<!--thinking-->\n" + thinking + "\n<!--/thinking-->\n" : "") + content;
        assistantDiv.innerHTML = renderAssistant(full);
        $("#messages").scrollTop = $("#messages").scrollHeight;
      }
    }
  } catch (e) {
    if (e.name !== "AbortError") {
      assistantDiv.innerHTML += "<p class='error'>connection lost</p>";
    }
  } finally {
    assistantDiv.classList.remove("streaming");
    state.streaming = false;
    state.abort = null;
    $("#send").hidden = false;
    $("#stop").hidden = true;
    loadMessages(); // pick up persisted ids + sources map
  }
}

// ---------- refresh status polling ----------

let refreshTimer = null;

async function triggerRefresh() {
  const resp = await api("/../update/all", { method: "POST" });
  if (resp.status === 429) {
    $("#refresh-status").textContent = "refresh already running";
  }
  pollRefresh();
}

async function pollRefresh() {
  if (refreshTimer) clearInterval(refreshTimer);
  refreshTimer = setInterval(async () => {
    const resp = await api("/refresh/status");
    const st = await resp.json();
    const el = $("#refresh-status");
    if (st.state === "running") {
      const pct = Math.round((st.progress || 0) * 100);
      el.textContent = `refreshing… ${pct}% (${st.success || 0} ok, ${st.skipped || 0} skipped)`;
    } else if (st.state === "done") {
      el.textContent = `done: ${st.success} indexed, ${st.skipped} skipped`;
      clearInterval(refreshTimer);
    } else if (st.state === "failed") {
      el.textContent = "refresh failed";
      clearInterval(refreshTimer);
    } else {
      el.textContent = "";
      clearInterval(refreshTimer);
    }
  }, 3000);
}

// ---------- boot ----------

window.addEventListener("DOMContentLoaded", async () => {
  await loadMe();
  await loadConversations();
  const m = window.location.pathname.match(/\/chat\/([0-9a-f-]{36})$/);
  if (m) await selectConversation(m[1]);
  $("#send").onclick = sendQuestion;
  $("#stop").onclick = () => state.abort && state.abort.abort();
  $("#input").addEventListener("keydown", (e) => {
    if (e.key === "Enter" && !e.shiftKey) {
      e.preventDefault();
      sendQuestion();
    }
  });
  $("#new-conv").onclick = async () => {
    state.current = null;
    $("#messages").innerHTML = "";
    $("#conv-title").textContent = "New conversation";
    history.replaceState(null, "", "/chat/");
  };
  $("#refresh-kb").onclick = triggerRefresh;
  $("#menu-toggle").onclick = () => $("#sidebar").classList.toggle("open");
});
