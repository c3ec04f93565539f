// ESP32 soft-AP hub: WiFi access point + 2-slot newline-framed TCP server +
// edge-triggered UART handshake.
//
// Re-implements the behavior of the reference firmware
// (`ESP32/ESP_AP/src/main.cpp:1-132`) against the same wire protocol the
// host-side hub (`native/robotlink.cpp`) speaks:
//   * soft-AP "ESP32_AP" / "12345678", TCP server on :80;
//   * at most MAX_CLIENTS concurrent clients — a new connection claims the
//     first empty or dead slot (stopping the dead socket first) and is
//     refused when all slots hold live clients;
//   * client messages are one line each, logged with the sender IP;
//   * a LOW->HIGH edge on DX_PIN starts the trigger handshake: send "DX:0"
//     on UART1, wait up to ECHO_TIMEOUT_MS for the exact echo, retry once
//     after RETRY_BACKOFF_MS (2 attempts total, echo-verify semantics —
//     the host hub mirrors these constants).

#include <Arduino.h>
#include <WiFi.h>

namespace {

constexpr char kApSsid[] = "ESP32_AP";
constexpr char kApPassword[] = "12345678";
constexpr uint16_t kServerPort = 80;
constexpr int kMaxClients = 2;

constexpr int kDxPin = 26;          // trigger input (rising edge starts handshake)
constexpr int kSxPin = 27;          // auxiliary sense input (read, reserved)
constexpr int kUartRxPin = 16;
constexpr int kUartTxPin = 17;
constexpr long kUartBaud = 9600;

constexpr const char* kTriggerMsg = "DX:0";
constexpr unsigned long kEchoTimeoutMs = 1000;
constexpr unsigned long kPostSendSettleMs = 20;
constexpr unsigned long kRetryBackoffMs = 1000;
constexpr int kMaxAttempts = 2;

HardwareSerial& link = Serial1;
WiFiServer server(kServerPort);
WiFiClient slots[kMaxClients];

// Accept a pending connection into the first free (or dead) slot; refuse it
// when every slot holds a live client.
void acceptPending() {
  if (!server.hasClient()) return;
  WiFiClient incoming = server.available();
  for (int i = 0; i < kMaxClients; i++) {
    if (slots[i] && slots[i].connected()) continue;
    if (slots[i]) slots[i].stop();  // reclaim a dead socket
    slots[i] = incoming;
    return;
  }
  Serial.println("hub full: refusing client");
  incoming.stop();
}

// Drain one newline-framed message per connected client per loop pass.
void pollClients() {
  for (int i = 0; i < kMaxClients; i++) {
    if (!slots[i] || !slots[i].connected() || !slots[i].available()) continue;
    String line = slots[i].readStringUntil('\n');
    line.trim();
    Serial.print("client ");
    Serial.print(slots[i].remoteIP());
    Serial.print(" -> ");
    Serial.println(line);
  }
}

// One attempt of the trigger handshake: send, settle, wait for the echo.
bool sendTriggerOnce() {
  link.println(kTriggerMsg);
  delay(kPostSendSettleMs);
  unsigned long start = millis();
  while (!link.available() && millis() - start < kEchoTimeoutMs) {
  }
  if (!link.available()) {
    Serial.println("trigger: no UART response");
    return false;
  }
  String echo = link.readStringUntil('\n');
  echo.trim();
  if (echo == kTriggerMsg) {
    Serial.println("trigger: echo verified");
    return true;
  }
  Serial.print("trigger: bad echo '");
  Serial.print(echo);
  Serial.println("'");
  return false;
}

// Rising-edge detector on DX with echo-verified, retried delivery.
void pollTriggerPin() {
  static int lastDx = LOW;
  int dx = digitalRead(kDxPin);
  (void)digitalRead(kSxPin);  // sampled for parity; unused by this hub
  if (dx == HIGH && lastDx == LOW) {
    Serial.println("trigger edge on DX");
    bool ok = false;
    for (int attempt = 0; attempt < kMaxAttempts && !ok; attempt++) {
      ok = sendTriggerOnce();
      if (!ok && attempt + 1 < kMaxAttempts) delay(kRetryBackoffMs);
    }
    if (!ok) Serial.println("trigger: delivery failed after retries");
  }
  lastDx = dx;
}

}  // namespace

void setup() {
  Serial.begin(kUartBaud);
  WiFi.softAP(kApSsid, kApPassword);
  Serial.print("AP up at ");
  Serial.println(WiFi.softAPIP());
  pinMode(kDxPin, INPUT);
  pinMode(kSxPin, INPUT);
  server.begin();
  link.begin(kUartBaud, SERIAL_8N1, kUartRxPin, kUartTxPin);
}

void loop() {
  acceptPending();
  pollClients();
  pollTriggerPin();
}
