// UART project scaffold.  The reference ships this project as the PlatformIO
// new-project hello-world stub (`ESP32/ESP_UART/src/main.cpp`: an unused
// add(2,3) and empty loop); its actual UART link logic lives in the AP
// firmware.  Kept as a buildable scaffold for layout parity.

#include <Arduino.h>

void setup() {}

void loop() {}
