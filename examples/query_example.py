"""Indexed queries: equals/range/filter/count/map/find.

Mirrors /root/reference/examples/bullet-query-example.js (same fixture:
10 users + 10 products).
"""

import _env  # noqa: F401 - sys.path + backend setup
import bullet_tpu as bt

USERS = {
    "user1": {"name": "Alice Johnson", "age": 28, "active": True, "role": "admin"},
    "user2": {"name": "Bob Smith", "age": 35, "active": True, "role": "user"},
    "user3": {"name": "Carol Davis", "age": 42, "active": False, "role": "user"},
    "user4": {"name": "Dave Wilson", "age": 23, "active": True, "role": "editor"},
    "user5": {"name": "Eve Brown", "age": 31, "active": True, "role": "user"},
    "user6": {"name": "Frank Miller", "age": 47, "active": False, "role": "admin"},
    "user7": {"name": "Grace Lee", "age": 29, "active": True, "role": "editor"},
    "user8": {"name": "Harry Taylor", "age": 39, "active": True, "role": "user"},
    "user9": {"name": "Irene Clark", "age": 26, "active": False, "role": "user"},
    "user10": {"name": "Jack Roberts", "age": 33, "active": True, "role": "admin"},
}

PRODUCTS = {
    "prod1": {"name": "Laptop", "price": 1200, "stock": 15, "category": "electronics"},
    "prod2": {"name": "Smartphone", "price": 800, "stock": 25, "category": "electronics"},
    "prod3": {"name": "Headphones", "price": 150, "stock": 50, "category": "accessories"},
    "prod4": {"name": "Mouse", "price": 30, "stock": 100, "category": "accessories"},
    "prod5": {"name": "Keyboard", "price": 80, "stock": 40, "category": "accessories"},
    "prod6": {"name": "Monitor", "price": 300, "stock": 20, "category": "electronics"},
    "prod7": {"name": "Desk Chair", "price": 250, "stock": 10, "category": "furniture"},
    "prod8": {"name": "Desk", "price": 400, "stock": 5, "category": "furniture"},
    "prod9": {"name": "Printer", "price": 200, "stock": 8, "category": "electronics"},
    "prod10": {"name": "Camera", "price": 600, "stock": 12, "category": "electronics"},
}


def main() -> None:
    bullet = bt.create({"disable_network": True, "storage": False})

    print("Populating database with sample data...")
    for uid, data in USERS.items():
        bullet.get(f"users/{uid}").put(data)
    for pid, data in PRODUCTS.items():
        bullet.get(f"products/{pid}").put(data)

    print("Creating indices...")
    bullet.index("users", "role").index("users", "age").index("users", "active")
    bullet.index("products", "category").index("products", "price")

    admins = bullet.equals("users", "role", "admin")
    print("Admins:", [n.value()["name"] for n in admins])
    assert len(admins) == 3

    thirties = bullet.range("users", "age", 30, 39)
    print("Users in their 30s:", sorted(n.value()["name"] for n in thirties))
    assert len(thirties) == 4

    active = bullet.equals("users", "active", True)
    assert len(active) == 7

    electronics = bullet.equals("products", "category", "electronics")
    print("Electronics:", sorted(n.value()["name"] for n in electronics))
    assert len(electronics) == 5

    pricey = bullet.range("products", "price", 300, 10_000)
    print("Products >= $300:", sorted(n.value()["name"] for n in pricey))
    assert len(pricey) == 5

    low_stock = bullet.filter("products", lambda v, k: isinstance(v, dict) and v["stock"] < 15)
    print("Low stock:", sorted(n.value()["name"] for n in low_stock))

    assert bullet.count("users", "role", "user") == 5

    names = bullet.map("users", lambda v, k: v["name"])
    assert len(names) == 10

    eve = bullet.find("users", lambda v, k: v.get("name", "").startswith("Eve"))
    print("Found:", eve.value())
    assert eve.path == "users/user5"

    bullet.close()
    print("Query example completed")


if __name__ == "__main__":
    main()
