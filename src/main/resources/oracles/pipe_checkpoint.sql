SELECT * FROM (VALUES
(CAST('verify' AS VARCHAR),CAST('triples' AS VARCHAR),CAST(0 AS INTEGER),CAST(29 AS BIGINT),CAST(112 AS BIGINT),CAST('doc108' AS VARCHAR),CAST('doc73' AS VARCHAR),CAST(0 AS BIGINT),CAST(TRUE AS BOOLEAN),CAST('ok' AS VARCHAR)),
('verify','triples',1,23,70,'doc101','doc77',0,TRUE,'ok'),
('verify','triples',2,30,122,'doc106','doc64',0,TRUE,'ok'),
('verify','triples',3,39,145,'doc109','doc80',0,TRUE,'ok'),
('verify','triples',4,25,105,'doc113','doc93',0,TRUE,'ok'),
('verify','triples',5,26,95,'doc100','doc86',0,TRUE,'ok'),
('verify','triples',6,33,134,'doc116','doc82',0,TRUE,'ok'),
('verify','triples',7,36,120,'doc148','doc99',0,TRUE,'ok'),
('verify','triples',8,34,115,'doc124','doc9',0,TRUE,'ok'),
('verify','triples',9,36,115,'doc104','doc98',0,TRUE,'ok'),
('verify','triples',10,25,88,'doc1','doc97',0,TRUE,'ok'),
('verify','triples',11,22,76,'doc0','doc55',0,TRUE,'ok'),
('verify','triples',12,35,118,'doc105','doc96',0,TRUE,'ok'),
('verify','triples',13,31,94,'doc119','doc94',0,TRUE,'ok'),
('verify','triples',14,32,119,'doc138','doc90',0,TRUE,'ok'),
('verify','triples',15,37,135,'doc10','doc95',0,TRUE,'ok')
) AS t("run_id","stage","partition_id","doc_count","triple_count","min_doc","max_doc","wall_ms","spans_sig_ok","status")