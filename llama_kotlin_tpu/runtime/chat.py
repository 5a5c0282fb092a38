"""Chat template application.

Parity target: llama_chat_apply_template (reference src/llama.cpp:20331+),
which pattern-matches the model's stored jinja template string and applies
a hardcoded equivalent — same approach here (no jinja dependency).
"""

from __future__ import annotations

from typing import Iterable


def detect_template(template_str: str | None, arch: str = "") -> str:
    t = template_str or ""
    if "<|im_start|>" in t:
        return "chatml"
    if "<|start_header_id|>" in t:
        return "llama3"
    if "[INST]" in t:
        return "llama2"
    if "<start_of_turn>" in t:
        return "gemma"
    if "<|user|>" in t and "<|assistant|>" in t:
        return "phi3"
    if "<|prompter|>" in t:
        return "openassistant"
    if arch.startswith("gemma"):
        return "gemma"
    return "chatml"


def apply_chat_template(messages: Iterable[dict], template: str = "chatml",
                        add_assistant: bool = True) -> str:
    msgs = list(messages)
    out = []
    if template == "chatml":
        for m in msgs:
            out.append(f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n")
        if add_assistant:
            out.append("<|im_start|>assistant\n")
        return "".join(out)
    if template == "llama3":
        for m in msgs:
            out.append(
                f"<|start_header_id|>{m['role']}<|end_header_id|>\n\n{m['content']}<|eot_id|>"
            )
        if add_assistant:
            out.append("<|start_header_id|>assistant<|end_header_id|>\n\n")
        return "".join(out)
    if template == "llama2":
        system = ""
        parts = []
        for m in msgs:
            if m["role"] == "system":
                system = m["content"]
            elif m["role"] == "user":
                content = m["content"]
                if system:
                    content = f"<<SYS>>\n{system}\n<</SYS>>\n\n{content}"
                    system = ""
                parts.append(f"[INST] {content} [/INST]")
            else:
                # assistant turns terminate with </s> (the reference
                # llama2 branch, src/llama.cpp llama_chat_apply_template)
                parts.append(m["content"] + "</s>")
        return "".join(parts)
    if template == "gemma":
        for m in msgs:
            role = "model" if m["role"] == "assistant" else m["role"]
            if role == "system":  # gemma folds system into user turn
                role = "user"
            out.append(f"<start_of_turn>{role}\n{m['content']}<end_of_turn>\n")
        if add_assistant:
            out.append("<start_of_turn>model\n")
        return "".join(out)
    if template == "phi3":
        for m in msgs:
            out.append(f"<|{m['role']}|>\n{m['content']}<|end|>\n")
        if add_assistant:
            out.append("<|assistant|>\n")
        return "".join(out)
    raise ValueError(f"unknown chat template {template!r}")
